from geo_epic_spark.images.codec import (  # noqa: F401
    decode_image,
    encode_image,
    phash64,
    psnr,
)
