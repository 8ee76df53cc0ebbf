"""Driver-contract query registry (package form — VERDICT r10 item 9).

Shared state and helpers live in `_core`; each q*-module is one operator
family tranche, imported here in the ORIGINAL single-module registration
order so `QUERIES` iteration order (and the driver gate's rotation) is
bit-identical to the pre-split registry. tests/test_harness_contracts.py
pins the <=2.5k-LoC bound and the order.
"""

from cm_well_spark.registry._core import (  # noqa: F401
    ORACLES,
    QUERIES,
    _inf,
    _stats,
    _tri,
    oracle_sql,
    queries,
    register,
)

# family tranches, in registration order (imports run the @register calls)
from cm_well_spark.registry import q01_search  # noqa: E402,F401
from cm_well_spark.registry import q02_aggregations  # noqa: E402,F401
from cm_well_spark.registry import q03_traversal  # noqa: E402,F401
from cm_well_spark.registry import q04_sparql  # noqa: E402,F401
from cm_well_spark.registry import q05_merge  # noqa: E402,F401
from cm_well_spark.registry import q06_consume  # noqa: E402,F401
from cm_well_spark.registry import q07_pipeline  # noqa: E402,F401
from cm_well_spark.registry import q08_admin  # noqa: E402,F401
from cm_well_spark.registry import q09_events  # noqa: E402,F401
from cm_well_spark.registry import q10_coverage  # noqa: E402,F401
from cm_well_spark.registry import q11_curation  # noqa: E402,F401
from cm_well_spark.registry import q12_sparql_graph  # noqa: E402,F401
from cm_well_spark.registry import q13_round6  # noqa: E402,F401
from cm_well_spark.registry import q14_training  # noqa: E402,F401
from cm_well_spark.registry import q15_graph  # noqa: E402,F401
from cm_well_spark.registry import q16_analytics  # noqa: E402,F401
