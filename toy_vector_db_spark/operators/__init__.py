from .knn import knn, knn_join, lookup_vector  # noqa: F401
