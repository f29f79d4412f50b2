"""Image payload path (BASELINE.json input_hint: image+caption pairs).

- :mod:`synth` — stdlib+numpy codecs (raw RGB, BMP, PNG-via-zlib; no PIL in
  this environment, FIXTURES.md A1) and deterministic pixel generation
- :mod:`fixtures` — the synthetic images/images_ref/dim_fmt tables with
  planted violations, generated distributively (mapInPandas)
- :mod:`decode` — Arrow-batched decode + PSNR/allclose + caption-equality
  checks (the engine analog of $unmarshal + $validate, SURVEY §2.A R4/R5)
"""

from schisma_spark.image.synth import decode_image, encode_image, gen_pixels, psnr
from schisma_spark.image.decode import decode_validate

__all__ = ["encode_image", "decode_image", "gen_pixels", "psnr",
           "decode_validate"]
