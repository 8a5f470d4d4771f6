from logray.stages.parse import ParseBatch, normalize_text, parse_stage
from logray.stages.route import Route, Router, route_datasets, route_exclusive, write_routes
from logray.stages.enrich import EnrichBatch, enrich_stage, ROLE_TAXONOMY, TOOL_TAXONOMY
from logray.stages.aggregate import (
    exact_quantiles,
    grouped_quantiles,
    histogram,
    min_max,
    route_counts,
    top_k_groups,
    topk_per_key,
    turns_per_conversation,
)
from logray.stages.reshape import explode_list
from logray.stages.search import find_next_occurrence
from logray.stages.reassemble import (
    conversation_stats,
    fold_dialogue,
    fold_dialogues,
    ordered_view,
    preview,
    reassemble_conversations,
    turn_context,
)
from logray.stages.join import (
    asof_join,
    broadcast_anti_join,
    broadcast_join,
    broadcast_semi_join,
    hash_join,
    range_join,
)
from logray.stages.windowfn import (
    global_rank,
    lag_lead,
    rank_window,
    rolling_agg,
    value_window,
)
from logray.stages.stats import standardize, stats_agg, winsorize
from logray.stages.reshape import collect_list, unpivot
from logray.stages.aggregate import (
    binned_histogram,
    cube_agg,
    distinct_count_per_key,
    rollup_agg,
)
from logray.stages.window import (
    hopping_window,
    salted_histogram,
    sessionize,
    sessions_per_key,
    tumbling_window,
)

__all__ = [
    "global_rank",
    "value_window",
    "stats_agg",
    "standardize",
    "winsorize",
    "collect_list",
    "unpivot",
    "binned_histogram",
    "cube_agg",
    "rollup_agg",
    "distinct_count_per_key",
    "ParseBatch",
    "normalize_text",
    "parse_stage",
    "Route",
    "Router",
    "route_datasets",
    "route_exclusive",
    "write_routes",
    "EnrichBatch",
    "enrich_stage",
    "ROLE_TAXONOMY",
    "TOOL_TAXONOMY",
    "exact_quantiles",
    "explode_list",
    "grouped_quantiles",
    "topk_per_key",
    "hopping_window",
    "histogram",
    "top_k_groups",
    "min_max",
    "route_counts",
    "turns_per_conversation",
    "find_next_occurrence",
    "ordered_view",
    "preview",
    "reassemble_conversations",
    "conversation_stats",
    "fold_dialogues",
    "fold_dialogue",
    "turn_context",
    "asof_join",
    "broadcast_join",
    "broadcast_semi_join",
    "broadcast_anti_join",
    "hash_join",
    "range_join",
    "lag_lead",
    "rank_window",
    "rolling_agg",
    "salted_histogram",
    "sessionize",
    "sessions_per_key",
    "tumbling_window",
]
