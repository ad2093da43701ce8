"""Device compute kernels: k-means, stratified clustering, flux accumulation,
analysis linear algebra, dimensionality reduction."""
from . import kmeans, linalg, pca, stratified  # noqa: F401
