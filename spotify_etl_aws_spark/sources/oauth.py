"""OAuth2 flows for the REST source (SURVEY.md §2.1 S1) — the last
driver-side piece of the reference's ingestion story.

The reference ships two grant types:

- ``client_credentials`` (ingestion/ingestion/raw/raw.py:52-67: POST
  to the token endpoint with HTTP basic auth, used by the batch
  ingestor) — covered here by ``client_credentials_token``;
- the interactive AUTHORIZATION-CODE flow, for which it runs a local
  Flask callback server on :8888
  (ingestion/manager/OAuth2.0/callbackserver.py) that captures
  ``/callback?code=...`` — covered here by ``CallbackServer`` (stdlib
  ``http.server``, loopback-only, same response contract) plus the
  standard code-exchange/refresh requests, extended with PKCE
  (RFC 7636), which any 2020s public client should send.

Transport discipline matches ``sources/rest.py``: HTTP is an injected
callable ``(method, url, data, headers) -> (status, payload_dict)`` —
production wires requests/urllib, tests wire a fake; the engine
imports no network library. ``OAuthTokenProvider`` adapts a token
response into the ``TokenProvider`` the ``RestClient`` consumes, so
the full chain authorize -> callback -> exchange -> bearer fetch ->
401 refresh-retry runs against the same seams the reference exercises.
"""

from __future__ import annotations

import base64
import hashlib
import json
import secrets
import threading
import time
from collections.abc import Callable
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlencode, urlparse

# (method, url, form_data, headers) -> (status_code, payload_dict)
TokenTransport = Callable[[str, str, dict, dict], tuple[int, dict]]


class OAuthError(RuntimeError):
    pass


# --------------------------------------------------------------- PKCE


def generate_pkce() -> tuple[str, str]:
    """(code_verifier, code_challenge) per RFC 7636 S256: a 64-byte
    random verifier, base64url without padding; the challenge is the
    base64url SHA-256 of the verifier's ASCII bytes."""
    verifier = base64.urlsafe_b64encode(secrets.token_bytes(64)).rstrip(
        b"="
    ).decode("ascii")
    digest = hashlib.sha256(verifier.encode("ascii")).digest()
    challenge = base64.urlsafe_b64encode(digest).rstrip(b"=").decode("ascii")
    return verifier, challenge


def build_authorize_url(
    auth_endpoint: str,
    client_id: str,
    redirect_uri: str,
    scope: str = "",
    state: str | None = None,
    code_challenge: str | None = None,
) -> str:
    """The user-facing authorization URL (response_type=code), with
    optional state (CSRF binding) and PKCE challenge."""
    params = {
        "response_type": "code",
        "client_id": client_id,
        "redirect_uri": redirect_uri,
    }
    if scope:
        params["scope"] = scope
    if state:
        params["state"] = state
    if code_challenge:
        params["code_challenge"] = code_challenge
        params["code_challenge_method"] = "S256"
    return f"{auth_endpoint}?{urlencode(params)}"


# ---------------------------------------------------- callback server


class CallbackServer:
    """One-shot loopback HTTP server that captures the authorization
    redirect — the stdlib twin of the reference's Flask
    ``callbackserver.py`` (same /callback route, same success/error
    response shapes), hardened with optional ``state`` verification.

    Use as a context manager::

        with CallbackServer(port=8888, expected_state=state) as cb:
            print("open:", authorize_url)
            code = cb.wait_for_code(timeout=120)
    """

    def __init__(
        self,
        port: int = 8888,
        path: str = "/callback",
        expected_state: str | None = None,
    ) -> None:
        self._path = path
        self._expected_state = expected_state
        self._event = threading.Event()
        self.code: str | None = None
        self.error: str | None = None
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet: a server inside a CLI
                pass

            def do_GET(self) -> None:
                url = urlparse(self.path)
                if url.path != outer._path:
                    self.send_error(404)
                    return
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                code, error = q.get("code"), q.get("error")
                if (
                    outer._expected_state is not None
                    and q.get("state") != outer._expected_state
                ):
                    code, error = None, "state_mismatch"
                if code:
                    body, status = (
                        {"Success": "Authorization code received", "Code": code},
                        200,
                    )
                    outer.code = code
                elif error:
                    body, status = (
                        {"Error": "Authorization process failed", "Details": error},
                        400,
                    )
                    outer.error = error
                else:
                    self.send_response(400)
                    self.send_header("Content-Type", "text/plain")
                    self.end_headers()
                    self.wfile.write(b"No code or error provided.")
                    outer.error = "missing_code"
                    outer._event.set()
                    return
                payload = json.dumps(body).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
                outer._event.set()

        self._server = HTTPServer(("127.0.0.1", port), Handler)
        self.port = self._server.server_port  # resolved when port=0
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )

    def __enter__(self) -> "CallbackServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()

    @property
    def redirect_uri(self) -> str:
        return f"http://127.0.0.1:{self.port}{self._path}"

    def wait_for_code(self, timeout: float = 300.0) -> str:
        """Block until the redirect arrives; raises on error/timeout."""
        if not self._event.wait(timeout):
            raise OAuthError("timed out waiting for authorization redirect")
        if self.error:
            raise OAuthError(f"authorization failed: {self.error}")
        assert self.code is not None
        return self.code


# ------------------------------------------------------ token grants


def _basic_auth(client_id: str, client_secret: str) -> str:
    raw = f"{client_id}:{client_secret}".encode()
    return "Basic " + base64.b64encode(raw).decode("ascii")


def _post_token(
    transport: TokenTransport, token_endpoint: str, data: dict, headers: dict
) -> dict:
    status, payload = transport("POST", token_endpoint, data, headers)
    if status != 200:
        raise OAuthError(
            f"token endpoint returned {status}: "
            f"{payload.get('error', payload)}"
        )
    if "access_token" not in payload:
        raise OAuthError("token response missing access_token")
    return payload


def client_credentials_token(
    transport: TokenTransport,
    token_endpoint: str,
    client_id: str,
    client_secret: str,
) -> dict:
    """grant_type=client_credentials with HTTP basic auth — exactly
    the reference ingestor's request (raw.py:52-67)."""
    return _post_token(
        transport,
        token_endpoint,
        {"grant_type": "client_credentials"},
        {"Authorization": _basic_auth(client_id, client_secret)},
    )


def exchange_code(
    transport: TokenTransport,
    token_endpoint: str,
    client_id: str,
    code: str,
    redirect_uri: str,
    code_verifier: str | None = None,
    client_secret: str | None = None,
) -> dict:
    """grant_type=authorization_code; PKCE verifier for public
    clients, basic auth for confidential ones (either or both)."""
    data = {
        "grant_type": "authorization_code",
        "code": code,
        "redirect_uri": redirect_uri,
        "client_id": client_id,
    }
    if code_verifier:
        data["code_verifier"] = code_verifier
    headers = {}
    if client_secret:
        headers["Authorization"] = _basic_auth(client_id, client_secret)
    return _post_token(transport, token_endpoint, data, headers)


def refresh_token_grant(
    transport: TokenTransport,
    token_endpoint: str,
    client_id: str,
    refresh_token: str,
    client_secret: str | None = None,
) -> dict:
    data = {
        "grant_type": "refresh_token",
        "refresh_token": refresh_token,
        "client_id": client_id,
    }
    headers = {}
    if client_secret:
        headers["Authorization"] = _basic_auth(client_id, client_secret)
    return _post_token(transport, token_endpoint, data, headers)


class OAuthTokenProvider:
    """Adapts a token response into the zero-arg ``TokenProvider`` the
    ``RestClient`` consumes: serves the cached access token until
    ``expires_in`` (minus a safety margin) passes, then refreshes via
    the refresh-token grant — so the 401 retry in ``RestClient`` and
    proactive expiry refresh compose."""

    def __init__(
        self,
        transport: TokenTransport,
        token_endpoint: str,
        client_id: str,
        token_response: dict,
        client_secret: str | None = None,
        safety_margin_s: float = 30.0,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self._transport = transport
        self._endpoint = token_endpoint
        self._client_id = client_id
        self._client_secret = client_secret
        self._margin = safety_margin_s
        self._clock = clock
        self._lock = threading.Lock()
        self._install(token_response)

    def _install(self, resp: dict) -> None:
        self._access = resp["access_token"]
        # a refresh response may omit refresh_token: keep the old one
        self._refresh = resp.get("refresh_token", getattr(self, "_refresh", None))
        self._expires_at = self._clock() + float(resp.get("expires_in", 3600))

    def invalidate(self) -> None:
        """Force the next ``__call__`` to refresh — the hook
        ``RestClient`` pulls when the SERVER 401s a token our local
        expiry bookkeeping still considered live (revocation, clock
        skew)."""
        with self._lock:
            self._expires_at = float("-inf")

    def __call__(self) -> str:
        with self._lock:
            if self._clock() >= self._expires_at - self._margin:
                if not self._refresh:
                    raise OAuthError(
                        "access token expired and no refresh_token held"
                    )
                self._install(
                    refresh_token_grant(
                        self._transport,
                        self._endpoint,
                        self._client_id,
                        self._refresh,
                        self._client_secret,
                    )
                )
            return self._access
