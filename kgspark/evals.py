"""Deterministic E2E graph-building + retrieval eval, shaped after the
reference's LongMemEval eval (tests/evals/eval_e2e_graph_building.py:
32-180 and eval_cli.py).

The reference ingests multi-session chat transcripts per user
(role-tagged messages, one add_episode per message, group per user),
then LLM-judges candidate-vs-baseline per-episode graph results. This
engine is deterministic, so the eval is exact instead of judged:

1. FIXTURE — 12 users × 5 sessions with a scripted evolving fact
   timeline per user: employer changes, a two-hop MOVED_TO residence
   chain, a sentiment flip AND re-flip, IS_*_OF role predicates with a
   role re-assignment to a second person, plus all three episode source
   types (plain text, role-prefixed message, json — exercising every
   dispatch branch of _extract_core.extract_episode).
2. BUILD — one KGSpark store per run; every message is its own
   add_episode (the reference's exact ingestion shape), groups per user.
3. SCORE —
   - triple P/R vs the scripted expectation (north-star gate ≥ 0.95),
     keyed per group so identical cross-user facts stay distinct;
   - invalidation correctness (superseded facts closed, current open);
   - search-result ordering over ≥20 questions, compared to the
     committed golden ordering (the north star's "matching ... search
     result ordering on its eval episodes") — goldens regenerate via
     `python tools/eval_e2e.py --write-goldens`.

Re-flip semantics (documented, reference-parity): re-asserting a fact
that already exists — likes(t1), dislikes(t2), likes(t4) — is a
DUPLICATE of the t1 edge, which reuses the existing edge and appends
provenance (reference edge_operations.py:450-477; D9 dedupe first-wins).
The re-assertion therefore does NOT re-open the fact: final state is
likes CLOSED at t2, dislikes OPEN — the same outcome the reference's
per-episode path produces (the duplicate keeps valid_at=t1, and
invalidation only closes candidates OLDER than the new edge's validity).
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import pandas as pd

USERS = ["amy", "ben", "cara", "dan", "elena", "farid",
         "gina", "hiro", "iris", "jon", "kim", "luis"]
CITIES = ["Austin", "Denver", "Boston", "Seattle", "Miami", "Oslo",
          "Lisbon", "Dublin", "Geneva", "Osaka", "Quito", "Reno"]
EMPLOYERS = ["Initech", "Globex", "Hooli", "Umbrella", "Vandelay", "Soylent"]
TEAMS = ["Team Falcons", "Team Ospreys", "Team Ravens",
         "Team Herons", "Team Condors", "Team Magpies"]
PLACES = ["Paris", "Kyoto", "Cairo", "Lima", "Rome", "Bergen",
          "Malta", "Quebec", "Petra", "Sydney", "Venice", "Tulum"]
DRINKS = ["Coffee", "Tea"]
COLLEAGUE = "Dana Reed"

T0 = datetime(2024, 1, 10, 9, 0)
NOW = datetime(2024, 6, 1)


def _persona(user: str) -> dict:
    i = USERS.index(user)
    return {
        "nm": user.capitalize() + " Porter",
        "c1": CITIES[i], "c2": CITIES[(i + 1) % 12], "c3": CITIES[(i + 2) % 12],
        "e1": EMPLOYERS[i % 6], "e2": EMPLOYERS[(i + 3) % 6],
        "team": TEAMS[i % 6], "drink": DRINKS[i % 2], "place": PLACES[i],
    }


def _sessions_for(user: str) -> list[list[str]]:
    """Five sessions of episode bodies per user. Bodies carry their own
    source-type cue (the engine dispatches on content shape, reference
    nodes.py:57-90): plain sentences → text, "role: ..." → message,
    "{...}" → json."""
    p = _persona(user)
    nm, team = p["nm"], p["team"]
    return [
        [  # session 1 (text): initial facts + role predicate
            f"{nm} works at {p['e1']}. {nm} lives in {p['c1']}. "
            f"{nm} likes {p['drink']}. {nm} trusts {COLLEAGUE}. "
            f"{nm} is the manager of {team}.",
        ],
        [  # session 2 (message, two speakers): first move + sentiment flip
            f"user: {nm} moved to {p['c2']}. {nm} lives in {p['c2']}.",
            f"assistant: {nm} dislikes {p['drink']}. {COLLEAGUE} works at Globex.",
        ],
        [  # session 3 (json): profile snapshot (json extraction path)
            json.dumps({"name": nm, "employer": p["e1"],
                        "residence": p["c2"], "team": team}),
        ],
        [  # session 4 (message): employer change + second move + RE-FLIP
            f"user: {nm} works at {p['e2']}. {nm} moved to {p['c3']}. "
            f"{nm} lives in {p['c3']}. {nm} likes {p['drink']}.",
        ],
        [  # session 5 (text): role re-assignment + new role + travel
            f"{COLLEAGUE} is the manager of {team}. "
            f"{nm} is the director of {team}. {nm} visited {p['place']}.",
        ],
    ]


def expected_triples(user: str) -> set[tuple[str, str, str]]:
    p = _persona(user)
    nm, team = p["nm"], p["team"]
    return {
        (nm, "WORKS_AT", p["e1"]),
        (nm, "LIVES_IN", p["c1"]),
        (nm, "LIKES", p["drink"]),
        (nm, "TRUSTS", COLLEAGUE),
        (nm, "IS_MANAGER_OF", team),
        (nm, "MOVED_TO", p["c2"]),
        (nm, "LIVES_IN", p["c2"]),
        (nm, "DISLIKES", p["drink"]),
        (COLLEAGUE, "WORKS_AT", "Globex"),
        # json session: predicate = SCREAMING_SNAKE of the key
        (nm, "EMPLOYER", p["e1"]),
        (nm, "RESIDENCE", p["c2"]),
        (nm, "TEAM", team),
        (nm, "WORKS_AT", p["e2"]),
        (nm, "MOVED_TO", p["c3"]),
        (nm, "LIVES_IN", p["c3"]),
        (COLLEAGUE, "IS_MANAGER_OF", team),
        (nm, "IS_DIRECTOR_OF", team),
        (nm, "VISITED", p["place"]),
    }


def expected_open_closed(user: str) -> tuple[set, set]:
    """(facts that must be CLOSED by invalidation, facts still OPEN).
    LIVES_IN chain c1→c2→c3 and MOVED_TO chain c2→c3 (functional),
    WORKS_AT e1→e2 (functional), the sentiment flip (AFFECT class; the
    re-flip is a duplicate no-op — module docstring), and the
    IS_MANAGER_OF holder re-assignment (inverse-functional)."""
    p = _persona(user)
    nm, team = p["nm"], p["team"]
    closed = {
        (nm, "LIVES_IN", p["c1"]),
        (nm, "LIVES_IN", p["c2"]),
        (nm, "MOVED_TO", p["c2"]),
        (nm, "WORKS_AT", p["e1"]),
        (nm, "LIKES", p["drink"]),
        (nm, "IS_MANAGER_OF", team),
    }
    open_ = {
        (nm, "LIVES_IN", p["c3"]),
        (nm, "MOVED_TO", p["c3"]),
        (nm, "WORKS_AT", p["e2"]),
        (nm, "DISLIKES", p["drink"]),
        (nm, "TRUSTS", COLLEAGUE),
        (COLLEAGUE, "IS_MANAGER_OF", team),
        (nm, "IS_DIRECTOR_OF", team),
        (nm, "VISITED", p["place"]),
        (COLLEAGUE, "WORKS_AT", "Globex"),
        (nm, "EMPLOYER", p["e1"]),
        (nm, "RESIDENCE", p["c2"]),
        (nm, "TEAM", team),
    }
    return closed, open_


def questions_for(users: list[str]) -> list[tuple[str, str]]:
    """Ordering questions (2 per user → 24 at full roster). Question
    phrasing carries candidate terms (the BM25 analyzer does not stem —
    neither does the reference's Lucene standard analyzer — so "live"
    would not match "lives"; questions name the candidates, like
    LongMemEval's option-style questions)."""
    qs = []
    for u in users:
        p = _persona(u)
        qs.append((u, f"Does {p['nm']} live in {p['c1']} or {p['c3']}?"))
        qs.append((u, f"Does {p['nm']} work at {p['e1']} or {p['e2']}?"))
    return qs


def run_eval(spark, store_root: str, users: list[str] | None = None,
             last_n_sessions: int | None = None) -> dict:
    """Build per-user graphs message-by-message and score. Returns the
    metrics dict (see module docstring). ``users`` defaults to the full
    12-user roster (the committed EVAL_E2E.json); the pytest smoke uses
    a 4-user subset for runtime."""
    from kgspark.api import KGSpark

    users = users or USERS
    kg = KGSpark(spark, store_root)
    for user in users:
        for s_idx, session in enumerate(_sessions_for(user)[:last_n_sessions]):
            t = T0 + timedelta(days=7 * s_idx)
            for m_idx, content in enumerate(session):
                kg.add_episode(
                    name=f"s{s_idx}-m{m_idx}",
                    episode_body=content,
                    reference_time=t + timedelta(minutes=m_idx),
                    group_id=user,
                    now=NOW,
                )

    g = kg.graph()
    nodes = {r["uuid"]: r["name"] for r in g["nodes"].collect()}
    edge_rows = g["edges"].collect()
    # keyed per group: identical cross-user facts (the shared colleague's)
    # must not collapse across users
    got = {}
    for r in edge_rows:
        key = (r["group_id"], nodes[r["source_node_uuid"]], r["name"],
               nodes[r["target_node_uuid"]])
        got[key] = r

    # --- triple P/R (north-star gate)
    expected = set()
    for u in users:
        expected |= {(u, s, p, o) for (s, p, o) in expected_triples(u)}
    got_keys = set(got)
    tp = len(got_keys & expected)
    precision = tp / len(got_keys) if got_keys else 0.0
    recall = tp / len(expected)

    # --- bi-temporal invalidation correctness
    inv_ok, inv_total = 0, 0
    for u in users:
        closed, open_ = expected_open_closed(u)
        for s, p, o in closed:
            inv_total += 1
            r = got.get((u, s, p, o))
            if r is not None and r["invalid_at"] is not None:
                inv_ok += 1
        for s, p, o in open_:
            inv_total += 1
            r = got.get((u, s, p, o))
            if r is not None and r["invalid_at"] is None:
                inv_ok += 1

    # --- search-result ordering per question (top-3 facts, rank order —
    # collect the ranked frame directly; a join would destroy ordering)
    fact_by_uuid = {r["uuid"]: r["fact"] for r in edge_rows}
    orderings = {}
    for user, q in questions_for(users):
        ranked = kg.search(q, group_ids=[user], num_results=3).collect()
        orderings[f"{user}|{q}"] = [fact_by_uuid.get(r["uuid"], "?") for r in ranked]

    return {
        "triple_precision": round(precision, 4),
        "triple_recall": round(recall, 4),
        "invalidation_accuracy": round(inv_ok / inv_total, 4),
        "n_triples": len(got_keys),
        "n_users": len(users),
        "n_questions": len(orderings),
        "search_orderings": orderings,
    }


def compare_orderings(got: dict, golden: dict) -> float:
    """Fraction of GOT questions whose full top-k ordering matches the
    golden (golden may cover a superset of users — the pytest smoke runs
    a roster subset against the full committed goldens)."""
    keys = set(got)
    if not keys:
        return 0.0
    return sum(1 for k in keys if got[k] == golden.get(k)) / len(keys)


def load_goldens(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


# ------------------------------------------------------------------
# Homonym-splitting eval (VERDICT r4 item 8): measure split_homonyms'
# precision/recall across a threshold sweep with a GENERIC semantic
# embedder stand-in — a bag-of-words hash embedder (each token maps to a
# deterministic ±1 vector seeded by its md5; mention context = mean) —
# instead of the fixture-keyword embedder the unit tests inject. BOW
# cosine approximates token-overlap, the weakest honest proxy for a real
# sentence encoder: if the operating point holds here, a real encoder
# (which separates topics far more sharply) only widens the margin.

HOMONYM_THEMES = [
    ("Nike", "basketball shoe brand campaign trains athletes court arena "
             "sponsorship jersey"),
    ("Berkeley", "chemistry professor lectures students lab research "
                 "seminar thesis faculty tenure"),
    ("Vogue", "fashion magazine editor reviews couture fabric designs "
              "runway stylist photoshoot"),
    ("NASA", "orbital launch engineers test rocket propulsion hardware "
             "telemetry payload trajectory"),
    ("Sony", "studio producer records film scores orchestras mixing "
             "soundtrack session arrangement"),
    ("Mayo", "clinic surgeon treats cardiac patients hospital wards "
             "diagnosis recovery rounds"),
    ("Deere", "farm equipment dealer services tractors harvesters "
              "irrigation acreage silage grain"),
    ("Interpol", "liaison officer coordinates border investigations "
                 "warrants extradition casefiles jurisdictions"),
]
HOMONYM_NAMES = [
    f"{first} {last}"
    for first in ["Alex", "Sam", "Jordan", "Casey", "Riley"]
    for last in ["Hart", "Bell", "Frost", "Vance", "Cole",
                 "Lane", "Pike", "Wren"]
]  # 40 names; the first 20 get two personas (true homonyms)
N_HOMONYMS = 20
HOMONYM_GROUP = "homonyms.example"


def bow_hash_embedder(col):
    """Column-function (text → array<float>): mean of per-token ±1
    vectors, token seed = md5(token). Deterministic, vocabulary-free,
    and *generic* — nothing in it knows the eval fixture."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def emb(texts: pd.Series) -> pd.Series:
        import hashlib
        import re

        out = []
        for t in texts:
            toks = re.findall(r"[a-z0-9]+", (t or "").lower())
            v = np.zeros(64)
            for tok in toks:
                seed = int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[:8], "big")
                v += np.random.default_rng(seed).choice([-1.0, 1.0], size=64)
            n = np.linalg.norm(v)
            out.append((v / n if n else v).astype(np.float32))
        return pd.Series(out)

    return emb(col)


def homonym_pages() -> list[dict]:
    """Deterministic fixture: 40 same-group names × 6 mention pages.
    Names 0..19 are TRUE homonyms — two personas with disjoint context
    themes (3 pages each); names 20..39 are single entities whose 6
    pages share one theme. Each page is exactly two sentences (the
    extractor's summary window), name ≈ 2 of ~12 context tokens so the
    shared surface name cannot dominate the context cosine."""
    pages = []
    for i, name in enumerate(HOMONYM_NAMES):
        if i < N_HOMONYMS:
            personas = [HOMONYM_THEMES[i % 8], HOMONYM_THEMES[(i + 3) % 8]]
        else:
            personas = [HOMONYM_THEMES[i % 8]]
        for j in range(6):
            emp, theme = personas[j % len(personas)]
            words = theme.split()  # 10 theme words per pool
            # each page sees a rotating 6-of-10 window of its theme, so
            # two mentions of the SAME entity share only 2-6 theme
            # tokens — a realistic partial-overlap negative class (the
            # round-1 fixture repeated identical contexts, which made
            # precision trivially 1.0 at every threshold)
            start = (2 * j) % 10
            varied = " ".join((words + words)[start:start + 6])
            pages.append({
                "url": f"https://{HOMONYM_GROUP}/{i}-{j}",
                "warc_ts": T0 + timedelta(hours=i * 24 + j),
                "html": None,
                "text": f"{name} works at {emp}. The {varied}.",
                "lang": "en",
            })
    return pages


def run_homonym_eval(spark, thresholds=None) -> dict:
    """Sweep split_homonyms thresholds over the homonym fixture and
    report split precision / recall / mention purity per τ. Purity: for
    each correctly-split name, the fraction of its 6 mentions whose
    cluster agrees with the majority persona↔cluster matching."""
    import pandas as pd

    from pyspark.sql import functions as F

    from kgspark.operators.disambig import split_homonyms
    from kgspark.operators.extract import pages_to_episodes, run_extraction
    from kgspark.schemas import PAGES

    thresholds = thresholds or [0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
                                0.9, 0.95]
    pages = spark.createDataFrame(pd.DataFrame(homonym_pages()), PAGES)
    ext = run_extraction(pages_to_episodes(pages))
    episodes = ext.episodes.localCheckpoint()
    # restrict to the person nodes under test (employers are bystanders)
    person_norms = {n.lower() for n in HOMONYM_NAMES}
    ext_nodes = ext.ext_nodes.where(
        F.col("norm_name").isin(list(person_norms))).localCheckpoint()
    ext.cached.unpersist()

    # episode_uuid → (name index, persona index) truth, derived from the
    # deterministic url scheme (sha1 content addressing, extract.py)
    import hashlib as _h

    truth = {}
    for i in range(len(HOMONYM_NAMES)):
        npersonas = 2 if i < N_HOMONYMS else 1
        for j in range(6):
            ep = _h.sha1(
                f"episode:https://{HOMONYM_GROUP}/{i}-{j}".encode()).hexdigest()
            truth[ep] = (i, j % npersonas)

    norm_to_i = {n.lower(): i for i, n in enumerate(HOMONYM_NAMES)}
    rows_by_tau = {}
    for tau in thresholds:
        smap = split_homonyms(ext_nodes, episodes, threshold=tau,
                              embedder=bow_hash_embedder).collect()
        by_name: dict[int, dict] = {}
        node_norm = {r["uuid"]: r["norm_name"]
                     for r in ext_nodes.select("uuid", "norm_name")
                     .distinct().collect()}
        for r in smap:
            i = norm_to_i[node_norm[r["uuid"]]]
            by_name.setdefault(i, {}).setdefault(
                r["new_uuid"], []).append(r["episode_uuid"])
        predicted = {i for i, cl in by_name.items() if len(cl) >= 2}
        actual = set(range(N_HOMONYMS))
        tp = predicted & actual
        purities = []
        for i in tp:
            clusters = list(by_name[i].values())
            # best persona↔cluster matching (2×2): direct or swapped
            direct = sum(truth[e][1] == ci for ci, eps in enumerate(clusters)
                         for e in eps)
            swapped = sum(truth[e][1] == 1 - ci
                          for ci, eps in enumerate(clusters) for e in eps)
            purities.append(max(direct, swapped) / 6)
        rows_by_tau[str(tau)] = {
            "split_precision": round(len(tp) / len(predicted), 4)
            if predicted else 1.0,
            "split_recall": round(len(tp) / N_HOMONYMS, 4),
            "mention_purity": round(sum(purities) / len(purities), 4)
            if purities else None,
            "n_predicted": len(predicted),
        }
    return {
        "metric": "homonym_split_operating_points",
        "embedder": "bow_hash_64d (generic token-hash bag-of-words)",
        "fixture": f"{len(HOMONYM_NAMES)} names x 6 mentions, "
                   f"{N_HOMONYMS} true homonym pairs, one group",
        "by_threshold": rows_by_tau,
    }
