from .csr import BipartiteCSR
from .extract import Subgraph, extract_subgraph, extract_many

__all__ = ["BipartiteCSR", "Subgraph", "extract_subgraph", "extract_many"]
