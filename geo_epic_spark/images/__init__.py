from geo_epic_spark.images.codec import (  # noqa: F401
    bilinear_resize,
    decode_image,
    encode_image,
    phash64,
    psnr,
)
