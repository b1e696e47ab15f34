from geo_epic_spark.functions import registry  # noqa: F401
from geo_epic_spark.functions.select_dsl import select_str  # noqa: F401
from geo_epic_spark.functions.validators import (  # noqa: F401
    dly_violations,
    opc_violations,
    range_violations,
    sit_violations,
    sol_violations,
)
