from osmcha_spark.images.codec import decode_image, encode_image, psnr  # noqa: F401
from osmcha_spark.images.phash import ahash64, hamming64  # noqa: F401
