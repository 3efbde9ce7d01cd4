"""Golden tests for EXTRACTION SPEC v1 (pure Python, no Spark).

Narratives mirror the reference's fixtures (FIXTURES.md §2):
Alice/Bob (test_temporal_operations_int.py:44-91), Kamala Harris AG term
(examples/quickstart/quickstart.py:85-117), message + json episodes.
"""

from datetime import datetime, timedelta

from kgspark.functions.dates import parse_date, resolve_dates
from kgspark.operators._extract_core import extract_episode, mention_spans

REF = datetime(2024, 1, 2)


def triples(content, source="text", ref=REF):
    _, t, _ = extract_episode(content, source, ref)
    return [(x["subj"], x["pred"], x["obj"], x["valid_at"], x["invalid_at"]) for x in t]


def mentions(content, source="text", ref=REF):
    m, _, _ = extract_episode(content, source, ref)
    return [x["name"] for x in m]


def test_simple_sentiment():
    assert triples("Alice Smith likes Bob Jones.") == [
        ("Alice Smith", "LIKES", "Bob Jones", REF, None)
    ]
    assert triples("Alice Smith dislikes Bob Jones.") == [
        ("Alice Smith", "DISLIKES", "Bob Jones", REF, None)
    ]


def test_role_with_term_dates():
    got = triples(
        "Kamala Harris is the Attorney General of California "
        "from January 3, 2011 to January 3, 2017."
    )
    assert got == [(
        "Kamala Harris", "IS_ATTORNEY_GENERAL_OF", "California",
        datetime(2011, 1, 3), datetime(2017, 1, 3),
    )]
    # the role phrase is NOT an entity (prompts/extract_nodes.py:93-106)
    assert "Attorney General" not in mentions(
        "Kamala Harris is the Attorney General of California."
    )


def test_lowercase_role():
    got = triples("David Miller is the governor of Texas since March 1, 2020.")
    assert got == [("David Miller", "IS_GOVERNOR_OF", "Texas", datetime(2020, 3, 1), None)]


def test_message_speaker_first_person():
    m, t, _ = extract_episode("user: I moved to Paris last year", "message", REF)
    assert m[0] == {"name": "user", "entity_type": "Speaker"}
    assert [(x["subj"], x["pred"], x["obj"]) for x in t] == [("user", "MOVED_TO", "Paris")]
    assert t[0]["valid_at"] == REF - timedelta(days=365)


def test_json_episode():
    content = '{"name": "Gavin Newsom", "position": "Governor", "employer": "California"}'
    m, t, _ = extract_episode(content, "json", REF)
    assert m[0]["name"] == "Gavin Newsom"
    assert ("Gavin Newsom", "POSITION", "Governor") in [
        (x["subj"], x["pred"], x["obj"]) for x in t
    ]


def test_past_tense_no_default_valid_at():
    got = triples("Erin Garcia met Frank Miller.")
    assert got == [("Erin Garcia", "MET", "Frank Miller", None, None)]


def test_explicit_on_date():
    got = triples("Harris visited SF on March 5, 2023.")
    assert got == [("Harris", "VISITED", "SF", datetime(2023, 3, 5), None)]


def test_no_entities_in_filler():
    assert mentions("the report covers quarterly results and the team reviewed progress.") == []
    assert triples("the report covers quarterly results.") == []


def test_mention_spans_stopwords_and_dates():
    spans = [s[2] for s in mention_spans("The meeting with Alice Smith is on January 3, 2011.")]
    assert spans == ["Alice Smith"]


def test_dates():
    assert parse_date("January 3, 2011") == datetime(2011, 1, 3)
    assert parse_date("3 January 2011") == datetime(2011, 1, 3)
    assert parse_date("2011-01-03") == datetime(2011, 1, 3)
    assert parse_date("January 2011") == datetime(2011, 1, 1)
    assert resolve_dates("worked there since June 2, 2019.", REF, True) == (
        datetime(2019, 6, 2), None)
    assert resolve_dates("employed until May 1, 2021.", REF, True) == (
        REF, datetime(2021, 5, 1))
    assert resolve_dates("it happened yesterday.", REF, False) == (
        REF - timedelta(days=1), None)


def test_endpoint_check_drops_orphan_triples():
    # obj "quarterly" is lowercase → not a mention → no triple
    _, t, _ = extract_episode("Alice Smith likes quarterly.", "text", REF)
    assert t == []
