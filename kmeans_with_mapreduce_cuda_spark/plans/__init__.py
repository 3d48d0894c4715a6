from .registry import REGISTRY, Query, query  # noqa: F401

# Importing these modules populates REGISTRY.
from . import kmeans_queries  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import pipeline  # noqa: F401,E402
