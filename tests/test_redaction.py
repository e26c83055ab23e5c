"""Secret redaction (lineage/redaction.py — reference
``_secret_redaction.py`` applied at ``core/_context.py:424,454``):
hardcoded credential literals never reach the transform/run
registries; env-lookup references and unquoted RHS stay intact."""

import json

from lamindb_spark.lineage.context import Context
from lamindb_spark.lineage.redaction import (
    REDACTED,
    is_sensitive_key,
    redact_params,
    redact_source,
)


def test_sensitive_key_detection():
    for k in (
        "api_key",
        "API_KEY",
        "apiKey",
        "openai_api_key",
        "ACCESS_KEY_ID",
        "db_password",
        "passwd",
        "client_secret",
        "clientSecret",
        "private-key",
        "auth.token",
        "apikey",
    ):
        assert is_sensitive_key(k), k
    for k in ("key", "name", "tokenizer", "api_version", "secretariat_id"):
        assert not is_sensitive_key(k), k


def test_redact_source_quoted_literals_only():
    src = (
        'api_key = "sk-live-123"\n'
        "password: 'hunter2'\n"
        'os.environ["OPENAI_API_KEY"] = "sk-xyz"\n'
        '{"client_secret": "abc"}\n'
        'api_key = os.getenv("OPENAI_API_KEY")\n'  # env ref: keep
        "api_key: str\n"  # annotation: keep
        "api_key=api_key\n"  # forwarding: keep
        'url = "postgresql://user:pw@host:5432/db"\n'  # value-based
        'name = "not-a-secret"\n'
    )
    out, n = redact_source(src)
    assert n == 5
    assert f'api_key = "{REDACTED}"' in out
    assert f"password: '{REDACTED}'" in out
    assert f'os.environ["OPENAI_API_KEY"] = "{REDACTED}"' in out
    assert f'{{"client_secret": "{REDACTED}"}}' in out
    assert f'url = "{REDACTED}"' in out
    # preserved lines
    assert 'os.getenv("OPENAI_API_KEY")' in out
    assert "api_key: str" in out
    assert "api_key=api_key" in out
    assert '"not-a-secret"' in out
    assert "sk-live-123" not in out and "hunter2" not in out


def test_redact_source_annotated_and_triple_quoted():
    """Review findings: annotated assignments and triple-quoted
    literals must redact cleanly (the lazy quote match previously
    corrupted triple quotes while leaving the secret)."""
    src = (
        'password: str = "hunter2"\n'
        'token = """multi\nline secret"""\n'
        "count: int = 3\n"
        'name: str = "public"\n'
    )
    out, n = redact_source(src)
    assert n == 2
    assert f'password: str = "{REDACTED}"' in out
    assert f'token = """{REDACTED}"""' in out
    assert "hunter2" not in out and "line secret" not in out
    assert 'name: str = "public"' in out  # non-sensitive annotated: kept
    assert "count: int = 3" in out


def test_redact_params():
    got = redact_params(
        {
            "api_key": "sk-1",
            "lr": 0.1,
            "dsn": "postgres://u:p@h/db",
            "note": "fine",
        }
    )
    assert got == {
        "api_key": REDACTED,
        "lr": 0.1,
        "dsn": REDACTED,
        "note": "fine",
    }
    # review finding: nested dicts/lists are walked
    nested = redact_params(
        {"db": {"password": "x", "host": "h"}, "urls": ["postgres://u:p@h/d", "ok"]}
    )
    assert nested == {
        "db": {"password": REDACTED, "host": "h"},
        "urls": [REDACTED, "ok"],
    }


def test_track_redacts_stored_source_and_params(lakehouse):
    """Integration: the registry rows carry redacted source/params."""
    ctx = Context(lakehouse).track(
        "sec/job.py",
        source_code='api_key = "sk-live-999"\nprint("run")\n',
        params={"token": "t-123", "epochs": 3},
    )
    ctx.finish()
    tf = lakehouse.read_raw("transform").filter("key = 'sec/job.py'").first()
    assert "sk-live-999" not in tf["source_code"]
    assert REDACTED in tf["source_code"]
    run = (
        lakehouse.read_raw("run")
        .filter(f"transform_id = {tf['id']}")
        .first()
    )
    params = json.loads(run["params"])
    assert params == {"token": REDACTED, "epochs": 3}
