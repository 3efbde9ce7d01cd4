"""Q15: SearchResults → LLM-context string (reference
search_helpers.py:23-73 ``search_results_to_context_string``).

Driver-side formatting over the (already-trimmed, ≤ limit-sized) result
frames — validity ranges rendered as ``(date - date)`` with ``Present``
for open facts (search_helpers.py:53-59)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fmt_ts(ts) -> str:
    return ts.strftime("%Y-%m-%d %H:%M:%S") if ts is not None else "date unknown"


def format_fact(row) -> str:
    start = _fmt_ts(row["valid_at"])
    end = "Present" if row["invalid_at"] is None else _fmt_ts(row["invalid_at"])
    return f"  - {row['fact']} ({start} - {end})"


def search_results_to_context(
    results,
    graph: dict[str, DataFrame],
) -> str:
    """Render ranked facts / entities / episodes / communities into the
    reference's FACTS/ENTITIES/EPISODES/COMMUNITIES context block."""
    sections: list[str] = []

    def ranked_join(ranked, table, cols):
        if ranked is None:
            return []
        picked = ranked.select("uuid", "score")
        rows = (
            picked.join(table, "uuid")
            .select("uuid", "score", *cols)
            .collect()
        )
        order = {r["uuid"]: i for i, r in enumerate(ranked.select("uuid").collect())}
        return sorted(rows, key=lambda r: order.get(r["uuid"], 1 << 30))

    facts = ranked_join(results.edges, graph["edges"],
                        ["fact", "valid_at", "invalid_at"])
    if facts:
        sections.append("FACTS:\n" + "\n".join(format_fact(r) for r in facts))

    ents = ranked_join(results.nodes, graph["nodes"], ["name", "summary"])
    if ents:
        sections.append("ENTITIES:\n" + "\n".join(
            f"  - {r['name']}: {r['summary']}" for r in ents))

    eps = ranked_join(results.episodes, graph["episodes"],
                      ["name", "content"])
    if eps:
        sections.append("EPISODES:\n" + "\n".join(
            f"  - {r['name']}: {(r['content'] or '')[:200]}" for r in eps))

    if "communities" in graph:
        comms = ranked_join(results.communities, graph["communities"],
                            ["name", "summary"])
        if comms:
            sections.append("COMMUNITIES:\n" + "\n".join(
                f"  - {r['name']}: {r['summary']}" for r in comms))

    return "\n\n".join(sections)
