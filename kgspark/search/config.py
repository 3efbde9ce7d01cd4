"""Q13: search configuration dataclasses (SURVEY §2.5; reference
search/search_config.py:32-126 — reused as plain Python, not Spark)."""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

DEFAULT_SEARCH_LIMIT = 10  # reference search_config.py:29


class EdgeSearchMethod(str, Enum):
    cosine_similarity = "cosine_similarity"
    bm25 = "bm25"
    bfs = "breadth_first_search"


class NodeSearchMethod(str, Enum):
    cosine_similarity = "cosine_similarity"
    bm25 = "bm25"
    bfs = "breadth_first_search"


class EpisodeSearchMethod(str, Enum):
    bm25 = "bm25"


class CommunitySearchMethod(str, Enum):
    cosine_similarity = "cosine_similarity"
    bm25 = "bm25"


class EdgeReranker(str, Enum):
    rrf = "reciprocal_rank_fusion"
    node_distance = "node_distance"
    episode_mentions = "episode_mentions"
    mmr = "mmr"
    cross_encoder = "cross_encoder"


class NodeReranker(str, Enum):
    rrf = "reciprocal_rank_fusion"
    node_distance = "node_distance"
    episode_mentions = "episode_mentions"
    mmr = "mmr"
    cross_encoder = "cross_encoder"


class EpisodeReranker(str, Enum):
    rrf = "reciprocal_rank_fusion"
    cross_encoder = "cross_encoder"


class CommunityReranker(str, Enum):
    rrf = "reciprocal_rank_fusion"
    mmr = "mmr"
    cross_encoder = "cross_encoder"


@dataclass
class EdgeSearchConfig:
    search_methods: list[EdgeSearchMethod]
    reranker: EdgeReranker = EdgeReranker.rrf
    sim_min_score: float = 0.6
    mmr_lambda: float = 0.5
    bfs_max_depth: int = 2


@dataclass
class NodeSearchConfig:
    search_methods: list[NodeSearchMethod]
    reranker: NodeReranker = NodeReranker.rrf
    sim_min_score: float = 0.6
    mmr_lambda: float = 0.5
    bfs_max_depth: int = 2


@dataclass
class EpisodeSearchConfig:
    search_methods: list[EpisodeSearchMethod] = field(
        default_factory=lambda: [EpisodeSearchMethod.bm25])
    reranker: EpisodeReranker = EpisodeReranker.rrf


@dataclass
class CommunitySearchConfig:
    search_methods: list[CommunitySearchMethod] = field(
        default_factory=lambda: [CommunitySearchMethod.bm25])
    reranker: CommunityReranker = CommunityReranker.rrf


@dataclass
class SearchConfig:  # reference search_config.py:106-126
    edge_config: EdgeSearchConfig | None = None
    node_config: NodeSearchConfig | None = None
    episode_config: EpisodeSearchConfig | None = None
    community_config: CommunitySearchConfig | None = None
    limit: int = DEFAULT_SEARCH_LIMIT
    reranker_min_score: float = 0.0
