from .validate import validate_values, inspect_values, standardize_values, from_values  # noqa: F401
from .schema_check import check_schema_columns, check_dtypes  # noqa: F401
from .curator import CategoricalSpec, CurationError, DataFrameCurator  # noqa: F401
from .slots import (  # noqa: F401
    AnnDataCurator,
    MuDataCurator,
    SlotSpec,
    SlotsCurator,
    SpatialDataCurator,
)
from .slots import (  # noqa: F401
    curator_from_schema,
    save_composite_schema,
    save_feature_schema,
    slotspec_from_schema,
)
