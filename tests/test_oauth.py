"""OAuth2 flows (sources/oauth.py): PKCE vectors, authorize-URL
shape, the loopback callback server driven by a real local HTTP
request, token grants against a fake transport, and the provider's
expiry-refresh composing with RestClient's 401 retry."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from spotify_etl_aws_spark.sources.oauth import (
    CallbackServer,
    OAuthError,
    OAuthTokenProvider,
    build_authorize_url,
    client_credentials_token,
    exchange_code,
    generate_pkce,
    refresh_token_grant,
)


def test_pkce_rfc7636_vector():
    """RFC 7636 appendix B: the published verifier must map to the
    published S256 challenge."""
    import base64, hashlib

    verifier = "dBjftJeZ4CVP-mB92K27uhbUJU1p1r_wW1gFWFOEjXk"
    digest = hashlib.sha256(verifier.encode("ascii")).digest()
    challenge = base64.urlsafe_b64encode(digest).rstrip(b"=").decode()
    assert challenge == "E9Melhoa2OwvFrEMTJguCHaoeK1t8URWbuGJSstw-cM"
    # and our generator emits unpadded url-safe pairs that verify
    v, c = generate_pkce()
    assert "=" not in v and "=" not in c
    assert (
        base64.urlsafe_b64encode(hashlib.sha256(v.encode()).digest())
        .rstrip(b"=")
        .decode()
        == c
    )
    assert generate_pkce()[0] != v  # random per call


def test_authorize_url_shape():
    url = build_authorize_url(
        "https://accounts.example/authorize",
        client_id="cid",
        redirect_uri="http://127.0.0.1:8888/callback",
        scope="playlist-read-private",
        state="st8",
        code_challenge="ch",
    )
    assert url.startswith("https://accounts.example/authorize?")
    assert "response_type=code" in url
    assert "client_id=cid" in url
    assert "code_challenge=ch" in url and "code_challenge_method=S256" in url
    assert "state=st8" in url


def _get(url: str):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_callback_server_roundtrip_success():
    """Real loopback HTTP: the redirect lands, the response matches
    the reference callbackserver.py contract, wait_for_code returns."""
    with CallbackServer(port=0, expected_state="s1") as cb:
        status, body = _get(f"{cb.redirect_uri}?code=AUTHZ&state=s1")
        assert status == 200
        payload = json.loads(body)
        assert payload == {
            "Success": "Authorization code received",
            "Code": "AUTHZ",
        }
        assert cb.wait_for_code(timeout=5) == "AUTHZ"


def test_callback_server_error_and_state_mismatch():
    with CallbackServer(port=0) as cb:
        status, body = _get(f"{cb.redirect_uri}?error=access_denied")
        assert status == 400
        assert json.loads(body)["Details"] == "access_denied"
        with pytest.raises(OAuthError, match="access_denied"):
            cb.wait_for_code(timeout=5)
    with CallbackServer(port=0, expected_state="right") as cb:
        status, _ = _get(f"{cb.redirect_uri}?code=X&state=wrong")
        assert status == 400
        with pytest.raises(OAuthError, match="state_mismatch"):
            cb.wait_for_code(timeout=5)


def _fake_token_server(expected: dict, responses: list[tuple[int, dict]]):
    """Transport that asserts form fields and pops canned responses."""
    calls: list[dict] = []

    def transport(method, url, data, headers):
        assert method == "POST"
        calls.append({"url": url, "data": dict(data), "headers": dict(headers)})
        for k, v in expected.items():
            assert data.get(k) == v, (k, data)
        return responses[len(calls) - 1]

    transport.calls = calls
    return transport


def test_client_credentials_matches_reference_request():
    """raw.py:52-67 semantics: grant_type=client_credentials + HTTP
    basic auth."""
    t = _fake_token_server(
        {"grant_type": "client_credentials"},
        [(200, {"access_token": "AT", "expires_in": 3600})],
    )
    resp = client_credentials_token(t, "https://accounts/api/token", "id", "sec")
    assert resp["access_token"] == "AT"
    auth = t.calls[0]["headers"]["Authorization"]
    import base64

    assert auth == "Basic " + base64.b64encode(b"id:sec").decode()


def test_exchange_and_refresh_grants():
    t = _fake_token_server(
        {"grant_type": "authorization_code", "code": "C", "code_verifier": "V"},
        [(200, {"access_token": "AT1", "refresh_token": "RT", "expires_in": 60})],
    )
    resp = exchange_code(
        t, "https://accounts/api/token", "cid", "C",
        "http://127.0.0.1:1/callback", code_verifier="V",
    )
    assert resp["refresh_token"] == "RT"
    t2 = _fake_token_server(
        {"grant_type": "refresh_token", "refresh_token": "RT"},
        [(200, {"access_token": "AT2", "expires_in": 60})],
    )
    assert refresh_token_grant(t2, "e", "cid", "RT")["access_token"] == "AT2"
    # error surfaces loudly
    t3 = _fake_token_server({}, [(400, {"error": "invalid_grant"})])
    with pytest.raises(OAuthError, match="invalid_grant"):
        refresh_token_grant(t3, "e", "cid", "RT")


def test_token_provider_refreshes_on_expiry_and_keeps_refresh_token():
    clock = {"t": 0.0}
    t = _fake_token_server(
        {},
        [
            (200, {"access_token": "AT2", "expires_in": 100}),  # no new RT
            (200, {"access_token": "AT3", "refresh_token": "RT2", "expires_in": 100}),
        ],
    )
    prov = OAuthTokenProvider(
        t, "e", "cid",
        {"access_token": "AT1", "refresh_token": "RT1", "expires_in": 100},
        clock=lambda: clock["t"],
    )
    assert prov() == "AT1"
    clock["t"] = 80.0  # inside the 30s safety margin of expires_in=100
    assert prov() == "AT2"
    assert t.calls[0]["data"]["refresh_token"] == "RT1"
    clock["t"] = 160.0
    assert prov() == "AT3"  # reused RT1 (AT2 response had no new RT)
    assert t.calls[1]["data"]["refresh_token"] == "RT1"


def test_full_flow_against_rest_client(spark):
    """authorize URL -> loopback redirect -> code exchange -> bearer
    fetch through RestClient with a 401 mid-stream forcing the
    provider's refresh — the complete reference ingestion auth story
    on the engine's injected-transport seams."""
    from spotify_etl_aws_spark.sources.rest import RestClient

    verifier, challenge = generate_pkce()
    with CallbackServer(port=0, expected_state="st") as cb:
        url = build_authorize_url(
            "https://accounts.example/authorize", "cid",
            cb.redirect_uri, state="st", code_challenge=challenge,
        )
        assert "code_challenge" in url
        # the "user" approves: the AS redirects to our loopback
        _get(f"{cb.redirect_uri}?code=GRANT&state=st")
        code = cb.wait_for_code(timeout=5)
    responses = [
        (200, {"access_token": "OLD", "refresh_token": "RT", "expires_in": 3600}),
        (200, {"access_token": "NEW", "expires_in": 3600}),
    ]
    expected_grants = ["authorization_code", "refresh_token"]
    calls: list[dict] = []

    def tok_t(method, url, data, headers):
        calls.append(dict(data))
        assert data["grant_type"] == expected_grants[len(calls) - 1]
        return responses[len(calls) - 1]
    prov = OAuthTokenProvider(
        tok_t, "e", "cid",
        exchange_code(tok_t, "e", "cid", code, "r", code_verifier=verifier),
    )

    hits = []

    def api_transport(url, params, headers):
        hits.append(headers["Authorization"])
        if headers["Authorization"] == "Bearer OLD":
            return 401, {}
        return 200, {"ok": True}

    client = RestClient("https://api.example", prov, api_transport)
    assert client.get("x") == {"ok": True}
    # first call used the server-revoked token; the 401 path
    # invalidated the provider's cache, so the retry carried a
    # genuinely refreshed token
    assert hits == ["Bearer OLD", "Bearer NEW"]
