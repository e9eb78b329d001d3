"""Live HTTPS transport for the paged-REST source.

The one piece of the reference's ingestion the sandbox can't run: the
actual network call (reference: ingestion-elasticsearch.py:10-25 the
OAuth client-credentials POST, :66-130 the paged GET with
``range=start-end`` params and ``Content-Range`` totals). Everything
else — pagination planning, 429/Retry-After backoff, the error
channel, token round-robin — already lives engine-side behind the
injectable ``fetch`` contract (rest_paged.Fetch), so a live deployment
is exactly this module: a picklable ``requests``-backed callable
dropped into the same ``fetch_pages`` retry path the fixture transport
exercises.

No import-time ``requests`` dependency: the import happens inside the
call, so the engine (and its tests) run without the package; only a
task that actually fetches needs it. The transport is deliberately
dumb — it does NOT retry or interpret statuses, because
``fetch_pages`` owns throttling/backoff/error policy and a transport
that retried underneath it would double-apply backoff.
"""

from __future__ import annotations

from .rest_paged import TokenPool


def oauth_client_credentials(token_url: str, scope: str):
    """``authenticate(client_id, client_secret) -> token`` factory for
    :class:`TokenPool` doing the standard OAuth2 client-credentials
    POST (the reference's token dance, ingestion-elasticsearch.py:
    10-25; France Travail uses ``application/x-www-form-urlencoded``
    with a ``scope`` that names the API product). Returns the bearer
    token string; raises on a non-2xx token response — a credential
    that can't authenticate should fail the run loudly, not silently
    rotate."""

    def authenticate(client_id: str, client_secret: str) -> str:
        import requests

        resp = requests.post(
            token_url,
            data={
                "grant_type": "client_credentials",
                "client_id": client_id,
                "client_secret": client_secret,
                "scope": scope,
            },
            timeout=30,
        )
        resp.raise_for_status()
        return resp.json()["access_token"]

    return authenticate


class HttpPagedTransport:
    """Picklable ``fetch(url, params) -> (status, headers, body)`` over
    HTTPS. Each Spark task unpickles its own instance and lazily opens
    its own ``requests.Session`` (sessions hold sockets and are not
    picklable; ``__getstate__`` drops the cached one), drawing bearer
    tokens from the shared-by-value :class:`TokenPool` — partition-id
    rotation inside the pool spreads the fleet across credentials.

    A 401 marks the drawn token expired and is returned to the caller
    as-is: ``fetch_pages`` treats it as a failed page and its retry
    draws a fresh token — auth recovery composes with the existing
    retry path instead of duplicating it here.
    """

    def __init__(self, token_pool: TokenPool | None = None,
                 timeout: float = 30.0, extra_headers: dict | None = None,
                 session_factory=None):
        self.token_pool = token_pool
        self.timeout = timeout
        self.extra_headers = dict(extra_headers or {})
        # picklable zero-arg callable; lets deployments mount retry-free
        # custom adapters/proxies (and tests a fake) — default is a
        # plain requests.Session per task
        self.session_factory = session_factory
        self._session = None

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_session"] = None
        return state

    def __call__(self, url: str, params: dict) -> tuple[int, dict, str]:
        if self._session is None:
            if self.session_factory is not None:
                self._session = self.session_factory()
            else:
                import requests

                self._session = requests.Session()
        headers = dict(self.extra_headers)
        token = None
        if self.token_pool is not None:
            token = self.token_pool.get()
            headers["Authorization"] = f"Bearer {token}"
        resp = self._session.get(
            url, params=params, headers=headers, timeout=self.timeout
        )
        if resp.status_code == 401 and token is not None:
            self.token_pool.mark_expired(token)
        return resp.status_code, dict(resp.headers), resp.text
