"""Engine configuration — the reference's config.yaml surface.

Reference: /root/reference/internal/config/config.go
  Config{Server,Storage,Vector,Indexing}      (:12-18)
  DefaultConfig                               (:42-61)
  LoadConfig (missing file -> defaults)       (:64-92)
  SaveConfig                                  (:95-115)
and /root/reference/config.yaml (the shipped defaults).

Field-for-field parity, plus ``spark_index_params`` which maps the
reference's HNSW tuning knobs onto this engine's ANN tiers (SURVEY
§2 K8): HNSW is deliberately not ported (capability parity via
LSH/IVF/PQ — see operators/ann.py), so ``indexing.type: hnsw``
resolves to the IVF tier and the two HNSW knobs scale the analogous
recall/effort knobs. ``server`` is carried for round-trip parity but
nothing binds a port — the execution engine is Spark, not an RPC
daemon.
"""

from __future__ import annotations

import os
from dataclasses import asdict, dataclass, field


@dataclass
class ServerConfig:
    host: str = "127.0.0.1"
    port: int = 8080


@dataclass
class StorageConfig:
    data_dir: str = "./data"


@dataclass
class VectorConfig:
    default_dimension: int = 128


@dataclass
class IndexingConfig:
    type: str = "hnsw"
    hnsw_max_links: int = 16
    hnsw_ef_construct: int = 200


@dataclass
class EngineConfig:
    server: ServerConfig = field(default_factory=ServerConfig)
    storage: StorageConfig = field(default_factory=StorageConfig)
    vector: VectorConfig = field(default_factory=VectorConfig)
    indexing: IndexingConfig = field(default_factory=IndexingConfig)

    def resolve_index_type(self) -> str:
        """Map the configured index type onto an implemented tier.

        ``hnsw`` -> ``graph``: since r4 the direct analogue exists
        (operators/graph.KnnGraphIndex — bounded-degree k-NN graph +
        ef-beam search); max_links maps to the graph's out-degree m and
        efSearch to the beam width, so the reference's config tunes the
        same trade-offs it tuned there.
        """
        t = self.indexing.type.lower()
        if t == "hnsw":
            return "graph"
        if t in {"flat", "lsh", "ivf", "pq", "ivfpq", "graph"}:
            return t
        raise ValueError(f"unknown index type: {self.indexing.type!r}")

    def spark_index_params(self) -> dict:
        """ANN builder kwargs derived from the HNSW knobs.

        efConstruct/maxLinks bound per-node work during HNSW build and
        search; the analogous IVF/LSH knobs bound candidate-list width:
        - nlist: one inverted list per ~2*efConstruct vectors is the
          faiss sizing rule of thumb scaled to toy corpora; capped so
          tiny collections don't end up with empty lists.
        - nprobe: max_links/2 probes ~= the HNSW beam the reference
          defaults imply (16 links -> 8 probes ~ recall .9+ on the
          clustered fixture, tests/test_ann_recall.py).
        - num_hash_tables (LSH tier): log2(efConstruct) tables.
        """
        ef = self.indexing.hnsw_ef_construct
        links = self.indexing.hnsw_max_links
        return {
            "nlist": max(4, ef // 2),
            "nprobe": max(1, links // 2),
            "num_hash_tables": max(2, ef.bit_length() - 1),
            # graph tier: max_links IS the out-degree; efSearch-shaped
            # beam width bounded below so tiny ef configs still search
            "m": max(2, links),
            "ef": max(16, ef // 4),
        }


def _parse_simple_yaml(text: str) -> dict:
    """Parse the two-level mapping subset the config file uses.

    Fallback when PyYAML is absent; handles exactly the shape
    SaveConfig emits (section: / indented key: value, # comments,
    quoted strings, ints).
    """
    out: dict[str, dict] = {}
    section: dict | None = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        indented = line[0] in " \t"
        key, _, val = line.strip().partition(":")
        val = val.strip()
        if not indented and val == "":
            section = out.setdefault(key, {})
        elif indented and section is not None:
            if val and val[0] in "\"'" and val[-1:] == val[0]:
                section[key] = val[1:-1]
            else:
                try:
                    section[key] = int(val)
                except ValueError:
                    section[key] = val
        else:
            raise ValueError(f"unsupported config line: {raw!r}")
    return out


def _loads(text: str) -> dict:
    try:
        import yaml
        return yaml.safe_load(text) or {}
    except ImportError:
        return _parse_simple_yaml(text)


def load_config(path: str | None = None) -> EngineConfig:
    """Load config from ``path``; missing file -> defaults, exactly
    like the reference (config.go:76-79)."""
    cfg = EngineConfig()
    if path is None:
        return cfg
    abspath = os.path.abspath(path)
    if not os.path.exists(abspath):
        return cfg
    with open(abspath, encoding="utf-8") as f:
        data = _loads(f.read())
    for section_name, section_obj in (("server", cfg.server),
                                      ("storage", cfg.storage),
                                      ("vector", cfg.vector),
                                      ("indexing", cfg.indexing)):
        for k, v in (data.get(section_name) or {}).items():
            if hasattr(section_obj, k):
                setattr(section_obj, k, v)
    return cfg


def save_config(cfg: EngineConfig, path: str) -> None:
    """Write config as YAML, creating parent dirs (config.go:95-115)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    lines = []
    for section_name in ("server", "storage", "vector", "indexing"):
        lines.append(f"{section_name}:")
        for k, v in asdict(getattr(cfg, section_name)).items():
            if isinstance(v, str):
                lines.append(f'  {k}: "{v}"')
            else:
                lines.append(f"  {k}: {v}")
        lines.append("")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
