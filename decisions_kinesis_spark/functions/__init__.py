from decisions_kinesis_spark.functions.filters import (  # noqa: F401
    apply_payload_filters,
    compile_payload_filters,
    json_object_valid,
    payload_filters_py,
)
