from .base import Algorithm
from .pagerank import PageRank
