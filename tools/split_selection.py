"""One-shot mechanical splitter for queries/selection.py (round-12
verdict item 5): move lane families into per-family modules, leave
the registry dicts and the driver's query ordering byte-identical,
and re-export every moved top-level name from selection so existing
imports (tests/, experiments/, tools/) keep working.

Gated by the full oracle sweep: SWEEP manifests before/after must
carry identical per-query value hashes.
"""

from __future__ import annotations

import re

SRC = "spotify_etl_aws_spark/queries/selection.py"

# (module, docstring-first-line, [(start, end), ...]) — 1-indexed,
# inclusive start, EXCLUSIVE end, validated against blank-line
# boundaries before cutting.
PLAN = [
    (
        "lanes_graph_events",
        "Event-funnel / graph-iteration lanes",
        [(1350, 1523), (1660, 1761), (1809, 1891)],
    ),
    (
        "lanes_temporal",
        "Dimension-history / CDC / as-of / temporal-join lanes",
        [(1891, 2090), (2230, 2376), (2546, 2580), (2622, 2751)],
    ),
    (
        "lanes_layout",
        "Data-layout keys and co-occurrence mining lanes",
        [(2376, 2475), (6929, 7143)],
    ),
    (
        "lanes_seqsim",
        "Sequence-similarity lanes (edit-distance joins, DTW)",
        [(2824, 3273)],
    ),
    (
        "lanes_media",
        "Perceptual media near-dup lanes (image/audio/video)",
        [(3273, 3540), (4222, 4636)],
    ),
    (
        "lanes_linkage",
        "Record-linkage lanes (Fellegi-Sunter family)",
        [(3540, 4094), (4805, 5298), (5603, 5899)],
    ),
    (
        "lanes_vector_select",
        "PQ search and diversity-selection lanes",
        [(4636, 4805), (5298, 5483)],
    ),
    (
        "lanes_monitoring",
        "Monitoring / stats / data-quality / privacy lanes",
        [(4094, 4222), (5483, 5526), (5899, 6929), (7143, 7402)],
    ),
]

HEADER = '''"""{title} — split out of queries/selection.py in round 12
(verdict item 5). The registry (selection.QUERIES / selection.ORACLE)
and the driver's query ordering are unchanged: selection re-exports
every name defined here, so ``queries.selection.<name>`` keeps
resolving for tests, experiments and tools. Lane bodies are moved
VERBATIM — the full-sweep manifest gate pins value-hash equality."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..sources.readers import load_table as t
from .vector import _embeddings, _query_vector

'''

NAME_RE = re.compile(r"^(?:def|class)\s+(\w+)|^(\w+)\s*=", re.M)


def top_level_names(text: str) -> list[str]:
    out = []
    for line in text.splitlines():
        m = re.match(r"^(?:def|class)\s+(\w+)", line)
        if m:
            out.append(m.group(1))
            continue
        m = re.match(r"^(\w+)\s*=", line)
        if m:
            out.append(m.group(1))
    seen, uniq = set(), []
    for n in out:
        if n not in seen:
            seen.add(n)
            uniq.append(n)
    return uniq


def main() -> None:
    lines = open(SRC).read().splitlines(keepends=True)
    n = len(lines)
    cut = [False] * (n + 1)
    for mod, title, ranges in PLAN:
        body_parts = []
        for a, b in ranges:
            assert 1 <= a < b <= n + 1, (mod, a, b)
            for i in range(a, b):
                assert not cut[i], f"overlap at line {i} ({mod})"
                cut[i] = True
            chunk = "".join(lines[a - 1 : b - 1])
            body_parts.append(chunk.strip("\n"))
        body = "\n\n\n".join(body_parts) + "\n"
        names = top_level_names(body)
        with open(f"spotify_etl_aws_spark/queries/{mod}.py", "w") as f:
            f.write(HEADER.format(title=title))
            f.write(body)
        print(f"{mod}: {body.count(chr(10))} lines, {len(names)} names")
    # remainder = uncut lines, with one import shim inserted after the
    # existing top-of-module imports (line of `from .vector import`)
    kept = [lines[i - 1] for i in range(1, n + 1) if not cut[i]]
    remainder = "".join(kept)
    shims = []
    for mod, title, ranges in PLAN:
        body = open(f"spotify_etl_aws_spark/queries/{mod}.py").read()
        body = body.split('"""', 2)[2]  # drop header docstring
        names = top_level_names(body)
        names = [x for x in names if x not in ("annotations",)]
        joined = ",\n    ".join(names)
        shims.append(
            f"from .{mod} import (  # noqa: F401 — re-exports, see {mod}\n"
            f"    {joined},\n)"
        )
    shim_block = (
        "\n# ---- round-12 split: lane families moved to per-family"
        " modules ----\n# (verdict item 5; every moved name re-exported"
        " so queries.selection.<name>\n# keeps working for tests,"
        " experiments and tools)\n" + "\n".join(shims) + "\n"
    )
    anchor = "from .vector import _embeddings, _query_vector\n"
    assert remainder.count(anchor) == 1
    remainder = remainder.replace(anchor, anchor + shim_block)
    open(SRC, "w").write(remainder)
    print(f"selection.py: {remainder.count(chr(10))} lines")


if __name__ == "__main__":
    main()
