"""The requests-backed live transport (the ~20 lines a real deployment
adds): contract-level tests with a fake Session — no network — proving
it composes with the SAME retry/error/token machinery the fixture
transport exercises."""

from __future__ import annotations

import json
import pickle

from data_analyse_marche_emploi_spark.sources.live_transport import (
    HttpPagedTransport,
    oauth_client_credentials,
)
from data_analyse_marche_emploi_spark.sources.rest_paged import TokenPool


class FakeResponse:
    def __init__(self, status, headers, text):
        self.status_code, self.headers, self.text = status, headers, text

    def raise_for_status(self):
        if self.status_code >= 400:
            raise RuntimeError(f"HTTP {self.status_code}")

    def json(self):
        return json.loads(self.text)


class FakeSession:
    """Serves 3-row pages of a 7-row collection with real
    Content-Range headers; 401s any request bearing a token marked
    revoked."""

    def __init__(self, revoked=()):
        self.revoked = set(revoked)
        self.calls = []

    def get(self, url, params=None, headers=None, timeout=None):
        self.calls.append((url, dict(params or {}), dict(headers or {})))
        auth = (headers or {}).get("Authorization", "")
        if auth.removeprefix("Bearer ") in self.revoked:
            return FakeResponse(401, {}, "expired")
        start, end = map(int, params["range"].split("-"))
        rows = [{"id": i} for i in range(start, min(end + 1, 7))]
        return FakeResponse(
            206,
            {"Content-Range": f"offres {start}-{end}/7"},
            json.dumps({"resultats": rows}),
        )


def test_fetch_contract_and_headers():
    t = HttpPagedTransport(extra_headers={"Accept": "application/json"})
    t._session = FakeSession()
    status, headers, body = t("https://api.example/search", {"range": "0-2"})
    assert status == 206
    assert headers["Content-Range"] == "offres 0-2/7"
    assert [r["id"] for r in json.loads(body)["resultats"]] == [0, 1, 2]
    assert t._session.calls[0][2]["Accept"] == "application/json"


def test_bearer_token_drawn_from_pool_and_401_marks_expired():
    auth_calls = []

    def fake_auth(cid, secret):
        auth_calls.append(cid)
        return f"tok-{cid}-{len(auth_calls)}"

    pool = TokenPool([("a", "sa"), ("b", "sb")], fake_auth)
    t = HttpPagedTransport(token_pool=pool)
    t._session = FakeSession(revoked={"tok-a-1"})
    # first draw is credential a's token -> 401 -> marked expired
    status, _, _ = t("https://api.example/search", {"range": "0-2"})
    assert status == 401
    # pool re-authenticated credential a immediately
    assert auth_calls == ["a", "b", "a"]
    # next draws rotate to b then the FRESH a token; both succeed
    assert t("https://api.example/search", {"range": "0-2"})[0] == 206
    assert t("https://api.example/search", {"range": "3-5"})[0] == 206
    sent = [c[2]["Authorization"] for c in t._session.calls]
    assert sent == ["Bearer tok-a-1", "Bearer tok-b-2", "Bearer tok-a-3"]


def test_transport_pickles_without_session():
    t = HttpPagedTransport(timeout=5.0)
    t._session = FakeSession()
    clone = pickle.loads(pickle.dumps(t))
    assert clone._session is None  # task-side copies open their own
    assert clone.timeout == 5.0


def test_live_transport_through_fetch_pages_error_channel(spark):
    """End-to-end through the engine's retry path: the live transport
    plugs into fetch_pages exactly like the fixture one — clean rows
    flow, a dead page becomes an error row, the job never fails."""
    from pyspark.sql import types as T

    from data_analyse_marche_emploi_spark.sources.rest_paged import (
        fetch_pages,
        page_plan,
        split_error_channel,
    )

    class DeadPageSession(FakeSession):
        def get(self, url, params=None, headers=None, timeout=None):
            if params["range"].startswith("3-"):
                return FakeResponse(500, {}, "boom")
            return super().get(url, params, headers, timeout)

    # session_factory (not a pre-set _session): each Spark task
    # unpickles the transport and opens its own session, exactly the
    # live code path
    t = HttpPagedTransport(session_factory=DeadPageSession)
    pages = page_plan(spark, total=7, page_size=3)
    schema = T.StructType([T.StructField("id", T.LongType())])
    fetched = fetch_pages(pages, t, "https://api.example/search", schema)
    clean, errors = split_error_channel(fetched)
    assert sorted(r.id for r in clean.collect()) == [0, 1, 2, 6]
    errs = errors.collect()
    assert len(errs) == 1 and "range=3-5" in errs[0].message


def test_oauth_client_credentials_posts_form(monkeypatch):
    import requests

    posted = {}

    def fake_post(url, data=None, timeout=None):
        posted.update({"url": url, **data})
        return FakeResponse(200, {}, json.dumps({"access_token": "tok-xyz"}))

    monkeypatch.setattr(requests, "post", fake_post)
    auth = oauth_client_credentials(
        "https://auth.example/token", scope="api_offres"
    )
    assert auth("cid", "secret") == "tok-xyz"
    assert posted["grant_type"] == "client_credentials"
    assert posted["client_id"] == "cid"
    assert posted["scope"] == "api_offres"
