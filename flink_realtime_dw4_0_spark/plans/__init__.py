from .catalog import CATALOG, QuerySpec  # noqa: F401
