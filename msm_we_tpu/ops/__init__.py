"""Device compute kernels: k-means, stratified clustering, flux accumulation,
analysis linear algebra, dimensionality reduction."""
from . import fluxmatrix, kmeans, linalg, pca, stratified  # noqa: F401
