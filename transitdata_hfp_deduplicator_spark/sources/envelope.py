"""The message-envelope data model (SURVEY.md §1.1).

The reference's unit of data is a Pulsar ``Message<byte[]>``: payload
bytes + key + eventTime + string properties (Deduplicator.java:117-123
forwards exactly these four).  The Spark-native shape is one DataFrame
row per message — identical to the built-in Kafka source's schema, so a
real broker source drops in without touching any operator:

    spark.readStream.format("kafka")...           # or pulsar connector
         .select(col("key").cast("string"),
                 col("value"),
                 col("timestamp").alias("event_time"),
                 ...headers → properties map)

No broker is available in this environment, so constructors here build
envelope frames from files / rows; everything downstream (dedup,
analytics) is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("event_time", T.TimestampType(), True),
        T.StructField("properties", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# property keys carrying the per-message schema tag
# (TransitdataSchema.parseFromPulsarMessage; ITDeduplicatorTest.java:67-68)
KEY_SCHEMA_VERSION = "schema-version"
KEY_PROTOBUF_SCHEMA = "protobuf-schema"

# whitelisted schema names (Deduplicator.java:76-80); anything else —
# including PassengerCount, whose typed parse throws and is swallowed
# (Deduplicator.java:86-93,104) — is deduped on raw payload bytes
KNOWN_SCHEMAS = ("MqttRawMessage", "HfpData", "PassengerCount")
CANONICALIZABLE_SCHEMAS = ("MqttRawMessage", "HfpData")


def canonical_payload(value=None, properties=None):
    """The canonicalization projection (A3, Deduplicator.java:69-106).

    The reference decodes+re-encodes protobuf because protobuf byte
    order is nondeterministic; any failure falls back to raw bytes.
    Expressed relationally: a schema-tag dispatch where the typed branch
    would be ``to_protobuf(from_protobuf(value))`` when a descriptor is
    registered, and every other tag degrades to the raw bytes — the
    same graceful-degradation contract.  Without protobuf descriptors
    (none ship in this environment) every branch is the raw-bytes
    branch, which is exactly the reference's behavior for untagged and
    PassengerCount messages.
    """
    value = F.col("value") if value is None else value
    properties = F.col("properties") if properties is None else properties
    tag = properties.getItem(KEY_PROTOBUF_SCHEMA)
    return F.when(
        tag.isin(*CANONICALIZABLE_SCHEMAS), value  # hook: to_protobuf(from_protobuf(...))
    ).otherwise(value)


def envelope_from_rows(spark: SparkSession, rows) -> DataFrame:
    return spark.createDataFrame(rows, ENVELOPE_SCHEMA)
