from .filters import Q, compile_filters, compile_lookup  # noqa: F401
from .search import search_rank, search  # noqa: F401
