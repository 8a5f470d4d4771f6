from logray.stages.parse import ParseBatch, normalize_text, parse_stage
from logray.stages.route import Route, Router, route_datasets, route_exclusive, write_routes
from logray.stages.enrich import EnrichBatch, enrich_stage, ROLE_TAXONOMY, TOOL_TAXONOMY
from logray.stages.aggregate import (
    histogram,
    min_max,
    route_counts,
    turns_per_conversation,
)
from logray.stages.search import find_next_occurrence
from logray.stages.reassemble import ordered_view, preview, reassemble_conversations

__all__ = [
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
    "histogram",
    "min_max",
    "route_counts",
    "turns_per_conversation",
    "find_next_occurrence",
    "ordered_view",
    "preview",
    "reassemble_conversations",
]
