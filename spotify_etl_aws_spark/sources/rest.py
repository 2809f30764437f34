"""REST API source (SURVEY.md §2.1 S1).

The reference's Spotify client (ingestion/ingestion/raw/raw.py:68-134:
bearer auth, token refresh, one retry on 401, ``search`` and
``playlists/{id}`` endpoints) is driver-side orchestration — an API
fetch is not distributable work, so it stays OUTSIDE the engine proper.
This module is the thin shim that completes the story: fetch payloads
on the driver, then hand them to Spark as a typed DataFrame
(``RAW_PLAYLIST`` schema) so everything downstream (shred -> medallion)
is identical whether the raw zone was landed by this client or by
pre-landed JSON files.

The HTTP transport is injected as a plain callable
``(url, params, headers) -> (status_code, payload_dict)`` — production
wires requests/urllib here; tests wire a fake. No network library is
imported by the engine itself.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..schemas import RAW_PLAYLIST

Transport = Callable[[str, dict, dict], tuple[int, dict]]
TokenProvider = Callable[[], str]


class RestSourceError(RuntimeError):
    pass


class RestClient:
    """Minimal bearer-auth REST client with 401 refresh-and-retry
    (raw.py:85-99 semantics)."""

    def __init__(
        self,
        base_url: str,
        token_provider: TokenProvider,
        transport: Transport,
    ) -> None:
        self._base_url = base_url.rstrip("/")
        self._token_provider = token_provider
        self._transport = transport
        self._token: str | None = None

    def _headers(self) -> dict:
        if self._token is None:
            self._token = self._token_provider()
        return {"Authorization": f"Bearer {self._token}"}

    def get(self, endpoint: str, params: dict | None = None) -> dict:
        url = f"{self._base_url}/{endpoint.lstrip('/')}"
        status, payload = self._transport(url, params or {}, self._headers())
        if status == 401:  # expired token: refresh once and retry (raw.py:90-92)
            # a 401 means the SERVER rejected the token regardless of
            # our local expiry bookkeeping — tell a caching provider
            # (sources/oauth.py OAuthTokenProvider) to drop its cache
            # so the re-call below yields a genuinely fresh token
            invalidate = getattr(self._token_provider, "invalidate", None)
            if invalidate is not None:
                invalidate()
            self._token = self._token_provider()
            status, payload = self._transport(url, params or {}, self._headers())
        if status != 200:
            raise RestSourceError(f"GET {url} -> {status}")
        return payload

    def playlist(self, playlist_id: str) -> dict:
        """raw.py:101-134 (playlist branch)."""
        return self.get(f"playlists/{playlist_id}")

    def search(
        self, query: str, search_type: str, genre: str | None = None, limit: int = 20
    ) -> dict:
        """raw.py:101-134 (search branch): genre folds into the query,
        limit is the API-side pushdown (SURVEY §2.6 O1)."""
        q = f"{query} genre:{genre}" if genre else query
        return self.get("search", {"q": q, "type": search_type, "limit": limit})


def playlists_to_df(spark: SparkSession, payloads: list[dict]) -> DataFrame:
    """Driver-fetched playlist payloads -> typed raw DataFrame. Extra API
    fields not in RAW_PLAYLIST are dropped; missing ones become NULL —
    the same contract as the schema-declared JSON reader."""
    return spark.createDataFrame(payloads, schema=RAW_PLAYLIST)


def ingest_playlists(
    spark: SparkSession, client: RestClient, playlist_ids: list[str]
) -> DataFrame:
    """The reference's execute_multiple loop (raw.py:301-317) as a
    fetch-then-parallelize: N driver-side GETs, one distributed frame."""
    return playlists_to_df(spark, [client.playlist(p) for p in playlist_ids])
