"""Q13: the 15 preset search recipes (reference
search/search_config_recipes.py:34-223, same names/combinations)."""

from kgspark.search.config import (
    CommunityReranker,
    CommunitySearchConfig,
    CommunitySearchMethod,
    EdgeReranker,
    EdgeSearchConfig,
    EdgeSearchMethod,
    EpisodeReranker,
    EpisodeSearchConfig,
    EpisodeSearchMethod,
    NodeReranker,
    NodeSearchConfig,
    NodeSearchMethod,
    SearchConfig,
)

_E_ALL = [EdgeSearchMethod.bm25, EdgeSearchMethod.cosine_similarity, EdgeSearchMethod.bfs]
_E_HYB = [EdgeSearchMethod.bm25, EdgeSearchMethod.cosine_similarity]
_N_ALL = [NodeSearchMethod.bm25, NodeSearchMethod.cosine_similarity, NodeSearchMethod.bfs]
_N_HYB = [NodeSearchMethod.bm25, NodeSearchMethod.cosine_similarity]
_C_HYB = [CommunitySearchMethod.bm25, CommunitySearchMethod.cosine_similarity]


def _combined(edge_rr, node_rr, community_rr=CommunityReranker.rrf):
    return SearchConfig(
        edge_config=EdgeSearchConfig(search_methods=_E_HYB, reranker=edge_rr),
        node_config=NodeSearchConfig(search_methods=_N_HYB, reranker=node_rr),
        episode_config=EpisodeSearchConfig([EpisodeSearchMethod.bm25],
                                           EpisodeReranker.rrf),
        community_config=CommunitySearchConfig(_C_HYB, community_rr),
    )


COMBINED_HYBRID_SEARCH_RRF = _combined(EdgeReranker.rrf, NodeReranker.rrf)
COMBINED_HYBRID_SEARCH_MMR = _combined(EdgeReranker.mmr, NodeReranker.mmr,
                                       CommunityReranker.mmr)
COMBINED_HYBRID_SEARCH_CROSS_ENCODER = _combined(
    EdgeReranker.cross_encoder, NodeReranker.cross_encoder, CommunityReranker.cross_encoder)

EDGE_HYBRID_SEARCH_RRF = SearchConfig(
    edge_config=EdgeSearchConfig(_E_HYB, EdgeReranker.rrf))
EDGE_HYBRID_SEARCH_MMR = SearchConfig(
    edge_config=EdgeSearchConfig(_E_HYB, EdgeReranker.mmr))
EDGE_HYBRID_SEARCH_NODE_DISTANCE = SearchConfig(
    edge_config=EdgeSearchConfig(_E_ALL, EdgeReranker.node_distance))
EDGE_HYBRID_SEARCH_EPISODE_MENTIONS = SearchConfig(
    edge_config=EdgeSearchConfig(_E_HYB, EdgeReranker.episode_mentions))
EDGE_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    edge_config=EdgeSearchConfig(_E_ALL, EdgeReranker.cross_encoder))

NODE_HYBRID_SEARCH_RRF = SearchConfig(
    node_config=NodeSearchConfig(_N_HYB, NodeReranker.rrf))
NODE_HYBRID_SEARCH_MMR = SearchConfig(
    node_config=NodeSearchConfig(_N_HYB, NodeReranker.mmr))
NODE_HYBRID_SEARCH_NODE_DISTANCE = SearchConfig(
    node_config=NodeSearchConfig(_N_ALL, NodeReranker.node_distance))
NODE_HYBRID_SEARCH_EPISODE_MENTIONS = SearchConfig(
    node_config=NodeSearchConfig(_N_HYB, NodeReranker.episode_mentions))
NODE_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    node_config=NodeSearchConfig(_N_ALL, NodeReranker.cross_encoder))

COMMUNITY_HYBRID_SEARCH_RRF = SearchConfig(
    community_config=CommunitySearchConfig(_C_HYB, CommunityReranker.rrf))
COMMUNITY_HYBRID_SEARCH_MMR = SearchConfig(
    community_config=CommunitySearchConfig(_C_HYB, CommunityReranker.mmr))
COMMUNITY_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    community_config=CommunitySearchConfig(_C_HYB, CommunityReranker.cross_encoder))
