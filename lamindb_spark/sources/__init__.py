from .readers import load_table, load_tables, read_payload  # noqa: F401
from .anndata_io import (  # noqa: F401
    read_anndata_zarr,
    read_h5ad,
    write_anndata_zarr,
    write_h5ad,
)
from .mudata_io import (  # noqa: F401
    MuDataLong,
    read_h5mu,
    read_mudata_zarr,
    write_mudata_zarr,
)
from .spatialdata_io import (  # noqa: F401
    SpatialDataLong,
    read_spatialdata_zarr,
    write_spatialdata_zarr,
)
