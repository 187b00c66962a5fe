"""Engine configuration — the reference's HOCON surface
(environment.conf) as a typed config with the same env-var override
pattern (``key=${?ENV_VAR}``, environment.conf:8,13,25).

Defaults mirror the reference's shipped values exactly; the TTL is
ENFORCED here (via watermark state expiry) where the reference only
declared it (Deduplicator.java:36-40 reads cacheTTL and never applies
it).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    return os.environ.get(name, default)


@dataclass(frozen=True)
class DedupConfig:
    # source (environment.conf:4-16)
    topic: str = field(default_factory=lambda: _env("PULSAR_CONSUMER_TOPIC", "hfp-raw"))
    multiple_topics: bool = field(
        default_factory=lambda: _env("PULSAR_CONSUMER_MULTIPLE_TOPICS", "false") == "true"
    )
    topics_pattern: str = field(
        default_factory=lambda: _env("PULSAR_CONSUMER_TOPICS_PATTERN", "")
    )
    # sink (environment.conf:17-20)
    output_topic: str = field(
        default_factory=lambda: _env("PULSAR_PRODUCER_TOPIC", "hfp-dedup")
    )
    # state TTL (environment.conf:24 — "4 hours"; enforced here)
    cache_ttl_ms: int = field(
        default_factory=lambda: int(_env("APPLICATION_CACHE_TTL_SECONDS", "14400")) * 1000
    )
    # analytics window (environment.conf:27 — "1 minutes")
    poll_interval: str = field(
        default_factory=lambda: _env("APPLICATION_ALERT_POLL_INTERVAL", "1 minute")
    )
    # alert band (environment.conf:29-34)
    duplicate_ratio_threshold: float = field(
        default_factory=lambda: float(_env("APPLICATION_ALERT_RATIO_THRESHOLD", "0.97"))
    )
    alert_on_threshold: bool = field(
        default_factory=lambda: _env("APPLICATION_ALERT_ON_THRESHOLD", "true") == "true"
    )
    # per-duplicate alert (environment.conf:33-34 — "alertOnDuplicate =
    # false"; Analytics.java:69-75 fires on EVERY duplicate with its
    # inter-duplicate delay when enabled)
    alert_on_duplicate: bool = field(
        default_factory=lambda: _env("APPLICATION_ALERT_ON_DUPLICATE", "false")
        == "true"
    )
