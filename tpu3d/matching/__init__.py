from tpu3d.matching.mnn import match_descriptors, MatchResult
from tpu3d.matching.bow import kmeans, vector_quantize, tfidf_vectors, build_codebook, topk_similar
from tpu3d.matching.pairs import build_view_graph, bfs_pair_order
from tpu3d.matching.tracks import TrackStore

__all__ = [
    "match_descriptors",
    "MatchResult",
    "kmeans",
    "vector_quantize",
    "tfidf_vectors",
    "build_codebook",
    "topk_similar",
    "build_view_graph",
    "bfs_pair_order",
    "TrackStore",
]
