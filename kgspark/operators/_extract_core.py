"""EXTRACTION SPEC v1 — the deterministic, version-frozen replacement for
the reference's LLM extraction calls (SURVEY §2.2 E1/E2/E3/E5).

Semantics preserved from the reference prompts:
- dispatch on source type message/json/text (node_operations.py:122-136)
- speaker-first for messages, "actor: content" convention (nodes.py:67-70,
  prompts/extract_nodes.py:93-106)
- no relations/dates/attribute-values as entities (prompts/extract_nodes.py:93-106)
- triples keyed by entity *names*, endpoints must be extracted entities
  (edge_operations.py:186-203)
- predicate SCREAMING_SNAKE_CASE (prompts/extract_edges.py:26,91)
- per-sentence fact text; date resolution vs reference_time (E3)
- blank names dropped (node_operations.py:189)

Pure Python (no Spark imports) so it unit-tests standalone and runs
inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import json
import re
from datetime import datetime

from kgspark.functions.dates import MONTHS, resolve_dates

# ------------------------------------------------------------------ lexicon
PRESENT_VERBS = {
    "likes": "LIKES", "dislikes": "DISLIKES", "loves": "LOVES", "hates": "HATES",
    "trusts": "TRUSTS", "distrusts": "DISTRUSTS", "supports": "SUPPORTS",
    "opposes": "OPPOSES", "knows": "KNOWS", "manages": "MANAGES",
    "mentors": "MENTORS", "leads": "LEADS", "owns": "OWNS",
    "works at": "WORKS_AT", "works for": "WORKS_FOR", "lives in": "LIVES_IN",
    "reports to": "REPORTS_TO", "supplies": "SUPPLIES",
    "is friends with": "IS_FRIENDS_WITH", "work at": "WORKS_AT",
    "live in": "LIVES_IN",
}
PAST_VERBS = {
    "met": "MET", "visited": "VISITED", "joined": "JOINED", "married": "MARRIED",
    "founded": "FOUNDED", "acquired": "ACQUIRED", "left": "LEFT",
    "moved to": "MOVED_TO", "partnered with": "PARTNERED_WITH",
}
_VERB_PATTERNS = sorted(
    [(k, v, True) for k, v in PRESENT_VERBS.items()]
    + [(k, v, False) for k, v in PAST_VERBS.items()],
    key=lambda kv: -len(kv[0]),
)

WEEKDAYS = {"monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday"}
# Capitalized tokens that never open/continue an entity span
STOP_CAP = {
    "the", "a", "an", "i", "he", "she", "they", "it", "we", "you", "my",
    "his", "her", "their", "its", "this", "that", "these", "those", "if",
    "in", "on", "at", "from", "to", "and", "but", "or", "not", "yesterday",
    "today", "tomorrow", "last", "next", "who", "what", "when", "where",
} | set(MONTHS) | WEEKDAYS

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
_TOKEN = re.compile(r"\S+")
_CAP = re.compile(r"^[A-Z][A-Za-z0-9'&.-]*$")
_MSG_PREFIX = re.compile(r"^([A-Za-z][\w .'-]{0,40}?):\s")
_ROLE_GAP_1 = re.compile(r"^(?:is|was|became)\s+(?:the|a|an)$")          # gap before role mention
_ROLE_GAP_2 = re.compile(r"^of$")                                        # gap after role mention
_ROLE_INLINE = re.compile(r"^(?:is|was|became)\s+(?:the|a|an)\s+([a-z][a-z ]{0,40}?)\s+of$")


def _snake_upper(s: str) -> str:
    return re.sub(r"[^A-Za-z0-9]+", "_", s.strip()).strip("_").upper()


def split_sentences(text: str) -> list[str]:
    return [s for s in _SENT_SPLIT.split(text.strip()) if s]


def _clean(tok: str) -> str:
    return tok.strip("\"'()[]{},;:!?").rstrip(".")


def mention_spans(sentence: str) -> list[tuple[int, int, str]]:
    """Maximal runs of capitalized tokens → (tok_start, tok_end_excl, name)."""
    toks = [_clean(m.group(0)) for m in _TOKEN.finditer(sentence)]
    spans: list[tuple[int, int, str]] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t and _CAP.match(t) and t.lower() not in STOP_CAP and not t.isdigit():
            j = i + 1
            while j < len(toks):
                tj = toks[j]
                if tj and _CAP.match(tj) and tj.lower() not in STOP_CAP and not tj.isdigit():
                    j += 1
                else:
                    break
            spans.append((i, j, " ".join(toks[i:j])))
            i = j
        else:
            i += 1
    return spans


def _gap_text(sentence_toks: list[str], a_end: int, b_start: int) -> str:
    return " ".join(_clean(t) for t in sentence_toks[a_end:b_start]).strip()


def extract_episode(
    content: str, source: str, ref: datetime
) -> tuple[list[dict], list[dict], str]:
    """→ (mentions [{name, entity_type}], triples [{subj,pred,obj,fact,
    valid_at,invalid_at}], summary)."""
    mentions: list[dict] = []
    triples: list[dict] = []
    seen: set[str] = set()

    def add_mention(name: str, etype: str = "Entity") -> None:
        name = name.strip()
        if not name:
            return  # blank names dropped (node_operations.py:189)
        key = name.lower()
        if key not in seen:
            seen.add(key)
            mentions.append({"name": name, "entity_type": etype})

    if source == "json":
        try:
            obj = json.loads(content)
        except (ValueError, TypeError):
            obj = None
        if isinstance(obj, dict):
            root = None
            for k in ("name", "title", "id"):
                v = obj.get(k)
                if isinstance(v, str) and v.strip():
                    root = v.strip()
                    add_mention(root)
                    break
            for k, v in obj.items():
                if k in ("name", "title", "id") or not isinstance(v, str):
                    continue
                v = v.strip()
                if not v or root is None:
                    continue
                if mention_spans(v):  # value itself a proper noun → entity + edge
                    add_mention(v)
                    triples.append({
                        "subj": root, "pred": _snake_upper(k), "obj": v,
                        "fact": f"{root} {k} {v}", "valid_at": ref, "invalid_at": None,
                    })
        summary = (content or "")[:200]
        return mentions, triples, summary

    speaker = None
    body = content or ""
    if source == "message":
        m = _MSG_PREFIX.match(body)
        if m:
            speaker = m.group(1).strip()
            add_mention(speaker, "Speaker")  # speaker-first (prompts/extract_nodes.py:93-106)
            body = body[m.end():]

    sentences = split_sentences(body)
    for sent in sentences:
        toks = [m.group(0) for m in _TOKEN.finditer(sent)]
        spans = mention_spans(sent)
        # inject speaker mention for first-person subjects in messages
        if speaker is not None:
            for idx, t in enumerate(toks):
                if _clean(t) == "I":
                    spans.append((idx, idx + 1, speaker))
            spans.sort()

        # role pattern: <M1> is the <RoleMention> of <M2> — role is NOT an entity
        role_idx: set[int] = set()
        consumed_pairs: set[tuple[int, int]] = set()
        k = 0
        while k + 2 < len(spans):
            a, b, c = spans[k], spans[k + 1], spans[k + 2]
            g1 = _gap_text(toks, a[1], b[0])
            g2 = _gap_text(toks, b[1], c[0])
            if _ROLE_GAP_1.match(g1) and _ROLE_GAP_2.match(g2):
                role_idx.add(k + 1)
                pred = f"IS_{_snake_upper(b[2])}_OF"
                present = not g1.startswith(("was", "became"))
                va, ia = resolve_dates(sent, ref, present)
                triples.append({
                    "subj": a[2], "pred": pred, "obj": c[2],
                    "fact": sent.strip(), "valid_at": va, "invalid_at": ia,
                })
                consumed_pairs.add((a[0], c[0]))
                k += 3
                continue
            k += 1

        ent_spans = [s for i, s in enumerate(spans) if i not in role_idx]
        for _, _, name in ent_spans:
            add_mention(name, "Speaker" if speaker is not None and name == speaker else "Entity")

        # verb patterns between adjacent entity mentions
        for (a, b) in zip(ent_spans, ent_spans[1:]):
            if (a[0], b[0]) in consumed_pairs:
                continue
            gap = _gap_text(toks, a[1], b[0]).lower()
            # inline lowercase role: "X is the governor of Y"
            m = _ROLE_INLINE.match(gap)
            if m:
                pred = f"IS_{_snake_upper(m.group(1))}_OF"
                present = gap.startswith("is")
                va, ia = resolve_dates(sent, ref, present)
                triples.append({"subj": a[2], "pred": pred, "obj": b[2],
                                "fact": sent.strip(), "valid_at": va, "invalid_at": ia})
                continue
            for phrase, pred, present in _VERB_PATTERNS:
                if gap == phrase or gap.startswith(phrase + " "):
                    va, ia = resolve_dates(sent, ref, present)
                    triples.append({"subj": a[2], "pred": pred, "obj": b[2],
                                    "fact": sent.strip(), "valid_at": va, "invalid_at": ia})
                    break

    # endpoint check (edge_operations.py:186-203): construction guarantees
    # endpoints are mentions; assert-filter anyway for safety.
    names = {m["name"].lower() for m in mentions}
    triples = [t for t in triples if t["subj"].lower() in names and t["obj"].lower() in names]

    # E5 extractive summary: first 2 sentences, ≤200 chars
    summary = " ".join(sentences[:2])[:200]
    return mentions, triples, summary
