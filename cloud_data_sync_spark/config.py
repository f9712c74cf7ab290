"""Config model: load / default / validate, mirroring the reference's
semantics (config.go:78-217) with driver-side Python dataclasses.

Validation reproduces every rule in config.go:111-159:
- at least one provider / one mapping
- unique provider IDs (seen-set → here a counter)
- each provider type carries its matching config block; unknown type errors
- every mapping's source/target provider ID must exist (referential
  integrity — the anti-join formulation lives in q_join_anti's family)
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

PROVIDER_TYPES = ("gcs", "aws", "azure", "minio")

_VARIANT_KEY = {
    "gcs": "gcsConfig",
    "aws": "awsConfig",
    "azure": "azureConfig",
    "minio": "minioConfig",
}


class ConfigError(ValueError):
    pass


@dataclass
class BucketMapping:
    source_provider_id: str
    source_bucket: str
    target_provider_id: str
    target_bucket: str

    @property
    def mapping_id(self) -> str:
        # sync.go:93-95 natural key format
        return (
            f"{self.source_provider_id}:{self.source_bucket}"
            f"->{self.target_provider_id}:{self.target_bucket}"
        )


@dataclass
class Config:
    database_path: str = "data.db"
    providers: list[dict] = field(default_factory=list)
    mappings: list[BucketMapping] = field(default_factory=list)


def load_config(path: str) -> Config:
    with open(path) as f:
        raw = json.load(f)
    if not isinstance(raw, dict):
        raise ConfigError(f"config root must be a JSON object, got {type(raw).__name__}")
    # shape checks BEFORE attribute access: valid-JSON-wrong-shape configs
    # ("providers": ["p1"], "mappings": [null]) must surface as the
    # documented ConfigError diagnostic, not a raw AttributeError traceback
    providers = raw.get("providers") or []
    mappings_raw = raw.get("mappings") or []
    if not isinstance(providers, list) or any(
        not isinstance(p, dict) for p in providers
    ):
        raise ConfigError("'providers' must be a list of provider objects")
    if not isinstance(mappings_raw, list) or any(
        not isinstance(m, dict) for m in mappings_raw
    ):
        raise ConfigError("'mappings' must be a list of mapping objects")
    cfg = Config(
        database_path=raw.get("databasePath") or "data.db",  # config.go:92-95 default
        providers=providers,
        mappings=[
            BucketMapping(
                source_provider_id=m.get("sourceProviderId", ""),
                source_bucket=m.get("sourceBucket", ""),
                target_provider_id=m.get("targetProviderId", ""),
                target_bucket=m.get("targetBucket", ""),
            )
            for m in mappings_raw
        ],
    )
    validate_config(cfg)
    return cfg


def validate_config(cfg: Config) -> None:
    if not cfg.providers:
        raise ConfigError("no providers configured")
    if any(not isinstance(p, dict) for p in cfg.providers):
        raise ConfigError("'providers' must be a list of provider objects")
    seen: set[str] = set()
    for p in cfg.providers:
        pid = p.get("id")
        if not pid:
            raise ConfigError("provider missing id")
        if pid in seen:
            raise ConfigError(f"duplicate provider ID: {pid}")
        seen.add(pid)
        ptype = p.get("type")
        if ptype not in PROVIDER_TYPES:
            raise ConfigError(f"unknown provider type: {ptype!r} (provider {pid})")
        if not p.get(_VARIANT_KEY[ptype]):
            raise ConfigError(f"provider {pid}: missing {_VARIANT_KEY[ptype]}")
    if not cfg.mappings:
        raise ConfigError("no mappings configured")
    for m in cfg.mappings:
        if m.source_provider_id not in seen:
            raise ConfigError(
                f"mapping references unknown source provider: {m.source_provider_id}"
            )
        if m.target_provider_id not in seen:
            raise ConfigError(
                f"mapping references unknown target provider: {m.target_provider_id}"
            )


DEFAULT_CONFIG: dict = {
    # config.go:162-217 default template, minus any real credentials
    "databasePath": "data.db",
    "providers": [
        {"id": "local-src", "type": "minio", "minioConfig": {"endpoint": "file:///tmp/src"}},
        {"id": "local-tgt", "type": "minio", "minioConfig": {"endpoint": "file:///tmp/tgt"}},
    ],
    "mappings": [
        {
            "sourceProviderId": "local-src",
            "sourceBucket": "bucket-a",
            "targetProviderId": "local-tgt",
            "targetBucket": "bucket-b",
        }
    ],
}


def save_default_config(path: str) -> None:
    with open(path, "w") as f:
        json.dump(DEFAULT_CONFIG, f, indent=2)
