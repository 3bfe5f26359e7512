"""Engine operators — library functions over public DataFrame APIs.

Design decision (SURVEY.md §4.3): operators are composable functions, not
custom Catalyst rules — simpler, version-stable, and the declared contract
never requires plan-level hooks.
"""

from swivel_spark_prep_spark.operators.swivel import SwivelPrepResult, prep  # noqa: F401
from swivel_spark_prep_spark.operators.asof import asof_join  # noqa: F401
