from .distance import (  # noqa: F401
    METRICS, cosine, distance, dotproduct, euclidean, manhattan,
)
from .vector import normalize, random_vector, vector_lit, zero_vector  # noqa: F401
