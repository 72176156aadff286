"""SQL-surface registration of the engine's scalar functions.

The reference exposes its custom logic to Flink SQL as registered
functions (KeywordUDTF via ``CREATE TEMPORARY FUNCTION ik_analyze`` —
FunctionUtil / KeywordUDTF.java — consumed as
``LATERAL TABLE(ik_analyze(fullword))``).  Spark 4's SQL UDFs
(``CREATE TEMPORARY FUNCTION … RETURNS … RETURN <expr>``) give the same
user experience WITHOUT leaving the JVM: the bodies below are the same
Column expressions the operators use, inlined by Catalyst at plan time —
codegen-compatible, pushdown-transparent, zero Python in the hot path.

The Flink UDTF call shape maps to::

    SELECT T.keyword
    FROM (SELECT keyword_tokens(fullword) AS ks FROM src),
         LATERAL explode(ks) AS T(keyword)

(the two-step form — Spark does not yet allow a SQL UDF call directly
inside a Generate).

Equivalence of each SQL body with its DataFrame twin is asserted in
tests/test_operators.py::test_sql_udfs_match_column_functions.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DDL = [
    # X13 keyword tokenizer (twin of text.tokenize_keywords): Han runs ->
    # character bigrams, everything else whitespace-split
    r"""
    CREATE OR REPLACE TEMPORARY FUNCTION keyword_tokens(s STRING)
    RETURNS ARRAY<STRING>
    RETURN flatten(transform(
      filter(split(trim(regexp_replace(lower(trim(s)), '(\\p{IsHan}+)', ' $1 ')),
                   '\\s+'), t -> length(t) > 0),
      t -> CASE WHEN t RLIKE '^\\p{IsHan}+$' AND length(t) >= 2
                THEN transform(sequence(1, length(t) - 1), i -> substr(t, i, 2))
                ELSE array(t) END))
    """,
    # twin of text.doc_fingerprint: md5 over whitespace-normalized text
    r"""
    CREATE OR REPLACE TEMPORARY FUNCTION doc_fingerprint(s STRING)
    RETURNS STRING
    RETURN md5(regexp_replace(lower(trim(s)), '\\s+', ' '))
    """,
    # twin of text.scrub_pii: emails then phone shapes
    r"""
    CREATE OR REPLACE TEMPORARY FUNCTION scrub_pii(s STRING)
    RETURNS STRING
    RETURN regexp_replace(
      regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>'),
      '\\+?[0-9][0-9()\\-\\s.]{7,}[0-9]', '<PHONE>')
    """,
    # twin of text.token_count_ws
    r"""
    CREATE OR REPLACE TEMPORARY FUNCTION token_count_ws(s STRING)
    RETURNS INT
    RETURN size(split(lower(trim(s)), '\\s+'))
    """,
    # twin of layout.morton_key for two 16-bit dimensions
    """
    CREATE OR REPLACE TEMPORARY FUNCTION morton2(x BIGINT, y BIGINT)
    RETURNS BIGINT
    RETURN aggregate(sequence(0, 15), CAST(0 AS BIGINT),
      (acc, i) -> acc | shiftleft(shiftright(x, i) & 1, 2 * i)
                      | shiftleft(shiftright(y, i) & 1, 2 * i + 1))
    """,
]


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Execute the CREATE FUNCTION DDL; returns the registered names."""
    for ddl in _DDL:
        spark.sql(ddl)
    return ["keyword_tokens", "doc_fingerprint", "scrub_pii", "token_count_ws", "morton2"]
