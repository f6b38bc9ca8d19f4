"""Image payload plumbing: codec roundtrip, PSNR gate, phash, block grid."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from p3_osm_transformer_spark.operators import images as im
from p3_osm_transformer_spark.sources import fixtures as fx


def test_codec_roundtrip_lossless():
    px = im.synth_pixels(42, 64, 48)
    out = im.decode_bytes(im.encode_pixels(px, "png"))
    assert np.array_equal(px, out)


def test_codec_lossy_psnr_gate():
    """input_hint: decoded-pixel allclose, PSNR ≥ 40 dB for lossy formats."""
    px = im.synth_pixels(7, 128, 128)
    out = im.decode_bytes(im.encode_pixels(px, "jpeg"))
    assert im.psnr(px, out) >= 40.0
    assert np.allclose(px, out, atol=3)


def test_phash_stability_and_sensitivity():
    px = im.synth_pixels(3, 64, 64)
    assert im.phash64(px) == im.phash64(px.copy())
    other = im.synth_pixels(4, 64, 64)
    assert im.phash64(px) != im.phash64(other)
    # lossy roundtrip preserves the perceptual hash
    lossy = im.decode_bytes(im.encode_pixels(px, "jpeg"))
    assert im.phash64(px) == im.phash64(lossy)


def test_decode_stats_distributed(spark):
    imgs = fx.images_table(spark, 40)
    stats = im.decode_stats(imgs).collect()
    assert len(stats) == 40
    # stored phash (computed at fixture build) == recomputed phash (caption
    # equality analogue of the per-row invariant)
    joined = (fx.images_table(spark, 40).select("image_id", "phash")
              .join(im.decode_stats(imgs).select("image_id", "phash_check"),
                    "image_id"))
    assert joined.filter(F.col("phash") != F.col("phash_check")).count() == 0


def test_pixel_blocks_shape(spark):
    imgs = fx.images_table(spark, 10)
    blocks = im.pixel_blocks(imgs, block=16).toPandas()
    one = blocks[blocks.image_id == blocks.image_id.iloc[0]]
    meta = imgs.filter(F.col("image_id") == blocks.image_id.iloc[0]) \
               .select("w", "h").collect()[0]
    assert len(one) == (meta["w"] // 16) * (meta["h"] // 16)
    assert blocks.block_mean.between(0, 255).all()


def test_unknown_format_raises():
    import pytest
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present: non-R16F bytes decode via the adapter")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        im.decode_bytes(b"\x89PNG\r\n\x1a\nxxxxxxxxxxxxxxxx")


def test_pil_adapter_decodes_real_png_when_available():
    """r4 verdict #8: environments WITH codecs decode real images through
    the same seam.  Skipped in the codec-less sandbox (PIL absent); in a
    deployment image this proves the adapter end-to-end: PIL-encoded PNG
    → decode_bytes → exact pixels (PNG is lossless)."""
    import io

    import numpy as np
    import pytest
    pytest.importorskip("PIL")
    from PIL import Image

    px = im.synth_pixels(7, 32, 24, c=3)
    buf = io.BytesIO()
    Image.fromarray(px, mode="RGB").save(buf, format="PNG")
    got = im.decode_bytes(buf.getvalue())
    assert got.shape == px.shape
    assert np.array_equal(got, px)
