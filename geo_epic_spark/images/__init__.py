from geo_epic_spark.images.codec import (  # noqa: F401
    bilinear_resize,
    decode_image,
    encode_image,
    phash64,
    psnr,
)
from geo_epic_spark.images.udfs import (  # noqa: F401
    decode_stats,
    full_images_df,
    psnr_vs_regen,
    resize_images,
)
