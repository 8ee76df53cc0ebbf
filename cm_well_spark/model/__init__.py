from cm_well_spark.model.schema import (  # noqa: F401
    FIELD_VALUE_TYPE,
    INFOTON_SCHEMA,
    VTYPE,
)
