"""Env-var configuration shim — frafka parity layer.

frafka initializes its Kafka source/sink from environment variables
via viper (``KAFKA_BROKERS``, ``KAFKA_TOPICS``,
``KAFKA_CONSUMER_GROUP``, consume-from-latest flag)
[upstream: frafka/source.go § InitSource, README — SURVEY.md §2
Tier A14]. This module maps the same variables onto Spark's Kafka
source/sink options so a frafka user's deployment config carries
over unchanged.
"""

from __future__ import annotations

import os
from collections.abc import Mapping


def source_options_from_env(env: Mapping[str, str] | None = None) -> dict[str, str]:
    """KAFKA_* env vars → ``readStream.format("kafka")`` options.

    Mirrors frafka's InitSource config surface:
    - KAFKA_BROKERS (comma-separated host:port) → kafka.bootstrap.servers
    - KAFKA_TOPICS (comma-separated)            → subscribe
    - KAFKA_CONSUMER_GROUP                      → kafka.group.id
    - KAFKA_CONSUME_LATEST ("true"/"false")     → startingOffsets
    - KAFKA_MAX_OFFSETS_PER_TRIGGER (ours)      → maxOffsetsPerTrigger
      (the Spark-side analog of librdkafka's fetch backpressure,
      SURVEY.md §4.1)
    """
    env = os.environ if env is None else env
    opts: dict[str, str] = {}
    if brokers := env.get("KAFKA_BROKERS"):
        opts["kafka.bootstrap.servers"] = brokers
    if topics := env.get("KAFKA_TOPICS"):
        opts["subscribe"] = topics
    if group := env.get("KAFKA_CONSUMER_GROUP"):
        opts["kafka.group.id"] = group
    latest = env.get("KAFKA_CONSUME_LATEST", "false").lower() in ("true", "1", "yes")
    opts["startingOffsets"] = "latest" if latest else "earliest"
    if max_offsets := env.get("KAFKA_MAX_OFFSETS_PER_TRIGGER"):
        opts["maxOffsetsPerTrigger"] = max_offsets
    return opts


def sink_options_from_env(env: Mapping[str, str] | None = None) -> dict[str, str]:
    """KAFKA_* env vars → ``writeStream.format("kafka")`` options.

    Mirrors frafka's InitSink (producer needs only brokers; topic is
    per-Send) [upstream: frafka/sink.go § InitSink — SURVEY.md §2
    Tier A9/A10]: KAFKA_BROKERS → kafka.bootstrap.servers,
    KAFKA_TOPIC (optional fixed topic) → topic.
    """
    env = os.environ if env is None else env
    opts: dict[str, str] = {}
    if brokers := env.get("KAFKA_BROKERS"):
        opts["kafka.bootstrap.servers"] = brokers
    if topic := env.get("KAFKA_TOPIC"):
        opts["topic"] = topic
    return opts
