"""Index manifest: config, collection stats, per-stage + per-partition
lineage, resumability markers.

The reference DROPS AND RECREATES its search index on every run
(Postgres2ElasticsearchIndexer.java:82,368-372) and has no lineage at
all; the north rule requires checkpointed resumable stages with
per-partition lineage + metrics — this module is that bookkeeping.

Commit protocol: every stage writes its parquet output first (Spark's
own _SUCCESS marker plus our row/byte/wall-time record), and the
manifest entry is written LAST via atomic rename — a crashed build is
resumed by re-running only stages without a committed manifest entry
whose config hash matches (SURVEY §7.5.6).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any

MANIFEST_NAME = "manifest.json"
FORMAT_VERSION = 1


@dataclass
class StageRecord:
    name: str
    rows: int
    wall_sec: float
    bytes: int
    config_hash: str
    partitions: dict[str, Any] = field(default_factory=dict)  # lineage
    extra: dict[str, Any] = field(default_factory=dict)


def config_hash(cfg: dict[str, Any]) -> str:
    return hashlib.sha256(json.dumps(cfg, sort_keys=True, default=str).encode()).hexdigest()[:16]


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


class Manifest:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.path = os.path.join(index_dir, MANIFEST_NAME)
        self.data: dict[str, Any] = {
            "format_version": FORMAT_VERSION,
            "config": {},
            "stats": {},
            "stages": {},
        }
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)

    # -- stage lifecycle ---------------------------------------------------

    def stage_done(self, name: str, cfg_hash: str) -> bool:
        rec = self.data["stages"].get(name)
        return bool(rec) and rec.get("config_hash") == cfg_hash

    def commit_stage(self, rec: StageRecord) -> None:
        self.data["stages"][rec.name] = asdict(rec)
        self._flush()

    def set_config(self, cfg: dict[str, Any]) -> None:
        self.data["config"] = cfg
        self._flush()

    def set_stats(self, **stats: Any) -> None:
        self.data["stats"].update(stats)
        self._flush()

    @property
    def stats(self) -> dict[str, Any]:
        return self.data["stats"]

    @property
    def config(self) -> dict[str, Any]:
        return self.data["config"]

    @property
    def stages(self) -> dict[str, Any]:
        return self.data["stages"]

    def _flush(self) -> None:
        os.makedirs(self.index_dir, exist_ok=True)
        # monotonic generation: every manifest write bumps it, so cache
        # invalidation (engine reader memo, API hit/aggregation caches)
        # never depends on filesystem timestamp granularity — a mutation
        # within one mtime tick still changes the key (the Iceberg
        # snapshot-id analog). Mirrored to a few-byte sidecar file so
        # readers get it without parsing the (lineage-bearing) manifest.
        self.data["generation"] = int(self.data.get("generation", 0)) + 1
        tmp = self.path + f".tmp.{os.getpid()}.{int(time.time() * 1e6)}"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, default=str)
        os.replace(tmp, self.path)  # atomic commit (Iceberg-snapshot analog)
        gen_tmp = tmp + ".gen"
        with open(gen_tmp, "w") as f:
            f.write(str(self.data["generation"]))
        os.replace(gen_tmp, os.path.join(self.index_dir, "generation"))
