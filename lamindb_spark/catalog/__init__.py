from .schemas import REGISTRY_SCHEMAS  # noqa: F401
from .lakehouse import Lakehouse  # noqa: F401
from .query import QuerySet  # noqa: F401
