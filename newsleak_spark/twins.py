"""Per-scale keying for oracle-twin artifacts and cached index dirs.

A few gate rows (the english analyzer twin, the IVF quantizer state)
materialize a parquet "twin" of a SQL-inexpressible stage so the
DuckDB oracle can verify the downstream pipeline by hash. Round 3
kept those twins at FIXED /tmp paths holding whatever scale ran last,
which breaks two ways (ADVICE r3): a bench run at sf0.1 concurrent
with the gate at sf0.01 clobbers the gate's twin, and an oracle
evaluated before its query at a non-gate scale reads stale data.

Fix: every twin path embeds the sf tag. Queries write the twin for
the sf they run at; ``oracle_sql()`` strings render against the tag
in ``$NEWSLEAK_ORACLE_SF_TAG`` (default: the driver's gate scale,
sf0.01) — tools/check_oracle.py sets it from its sf_dir before
rendering, so local sweeps at any scale stay self-consistent while
the driver's fixed-scale gate needs no configuration.

``data_fingerprint`` additionally keys cached /tmp artifacts (twin
markers, resumable index dirs) to the INPUT data's identity
(mtime+size of the parquet files), so a regenerated fixture at the
same path can never be served a stale twin or index (ADVICE r3).
"""

from __future__ import annotations

import os

ORACLE_SF_ENV = "NEWSLEAK_ORACLE_SF_TAG"
GATE_SF_DIR = "/root/testdata/sf0.01"


def sf_tag(sf_dir: str) -> str:
    """Filesystem-safe tag for a scale-factor directory."""
    return sf_dir.strip("/").replace("/", "_")


def oracle_sf_tag() -> str:
    """The sf tag oracle SQL strings should render twin paths for."""
    return os.environ.get(ORACLE_SF_ENV, sf_tag(GATE_SF_DIR))


def twin_path(base: str, tag: str) -> str:
    """Per-sf path for a materialized oracle-twin parquet."""
    return f"/tmp/{base}_{tag}.parquet"


def data_fingerprint(sf_dir: str, tables: tuple[str, ...] = ("documents",)) -> str:
    """Short content-identity token for the input parquet files
    (mtime ns + size), folded into cached artifact names so fixture
    regeneration invalidates them. Missing files contribute a fixed
    token (the artifact then keys only on the sf tag)."""
    parts = []
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        try:
            st = os.stat(p)
            parts.append(f"{st.st_mtime_ns}:{st.st_size}")
        except OSError:
            parts.append("absent")
    import hashlib

    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:10]
