// Provenance generator for the progressive+DRI JPEG fixtures in
// tests/fixtures/ (jpeg_progressive_dri_gray.jpg,
// jpeg_progressive_dri_color.jpg).  The encoder is javax.imageio —
// INDEPENDENT of the decoder under test (operators/jpeg_codec.py) —
// and the same library is the ground-truth decoder in the tests
// (Spark's `image` source), so encode and verify never share code
// with the implementation.  A <dri> node in the
// javax_imageio_jpeg_image_1.0 metadata tree sets the restart
// interval; progressive mode comes from the write param; the color
// fixture forces 1x1 sampling (componentSpec attributes) so the
// pixel comparison carries no chroma-upsample-policy slack.
//
//   javac GenProgDriFixtures.java && java GenProgDriFixtures <outdir>
import javax.imageio.*;
import javax.imageio.metadata.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.io.*;
import org.w3c.dom.*;

public class GenProgDriFixtures {
  static void write(BufferedImage img, String path, int dri,
                    boolean force11) throws Exception {
    ImageWriter wr = ImageIO.getImageWritersByFormatName("jpeg").next();
    ImageWriteParam p = wr.getDefaultWriteParam();
    p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT);
    ImageTypeSpecifier type = ImageTypeSpecifier.createFromRenderedImage(img);
    IIOMetadata md = wr.getDefaultImageMetadata(type, p);
    String fmt = "javax_imageio_jpeg_image_1.0";
    IIOMetadataNode root = (IIOMetadataNode) md.getAsTree(fmt);
    IIOMetadataNode seq = (IIOMetadataNode)
        root.getElementsByTagName("markerSequence").item(0);
    IIOMetadataNode driN = new IIOMetadataNode("dri");
    driN.setAttribute("interval", Integer.toString(dri));
    seq.insertBefore(driN, seq.getFirstChild());
    if (force11) {
      NodeList specs = root.getElementsByTagName("componentSpec");
      for (int i = 0; i < specs.getLength(); i++) {
        IIOMetadataNode cs = (IIOMetadataNode) specs.item(i);
        cs.setAttribute("HsamplingFactor", "1");
        cs.setAttribute("VsamplingFactor", "1");
      }
    }
    md.setFromTree(fmt, root);
    try (ImageOutputStream os =
             ImageIO.createImageOutputStream(new File(path))) {
      wr.setOutput(os);
      wr.write(null, new IIOImage(img, null, md), p);
    }
    wr.dispose();
  }

  public static void main(String[] a) throws Exception {
    String dir = a.length > 0 ? a[0] : ".";
    int w = 72, h = 56;
    BufferedImage gray = new BufferedImage(w, h,
        BufferedImage.TYPE_BYTE_GRAY);
    for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
      gray.getRaster().setSample(x, y, 0, (x*3 + y*7 + (x*y)/5) % 256);
    }
    write(gray, dir + "/jpeg_progressive_dri_gray.jpg", 3, false);
    // smooth gradients: no IDCT overshoot, so the cross-decoder pixel
    // comparison stays inside the established <=2 rounding envelope
    BufferedImage col = new BufferedImage(w, h,
        BufferedImage.TYPE_3BYTE_BGR);
    for (int y = 0; y < h; y++) for (int x = 0; x < w; x++) {
      int r = (x*255)/(w-1);
      int g = (y*255)/(h-1);
      int b = (int)(127 + 100*Math.sin(x/9.0)*Math.cos(y/7.0));
      col.setRGB(x, y, (r<<16)|(g<<8)|b);
    }
    write(col, dir + "/jpeg_progressive_dri_color.jpg", 2, true);
    System.out.println("written to " + dir);
  }
}
