"""Explicit StructType schemas — the engine never infers schemas.

The reference's lake writer infers schemas per 50-row pandas batch
(reference ``consumer/consumer.py:44``), a fidelity hazard this module
fixes: every table and the CDC envelope is declared once, here.

Three schema families:

- ``STAR``: the driver's test star (``/root/testdata/sf*/*.parquet``,
  FIXTURES.md §A) used by the correctness/bench harness.
- ``BANKING``: the reference's OLTP trio
  (reference ``docker/postgres/SCHEMA.sql:2-29``).
- ``CDC_ENVELOPE``: the Debezium JSON envelope as configured by the
  reference (schemas stripped — ``docker-compose.yml:44-47``; decimals
  as double — ``kafka-debezium/Connector_post_and_generate.py:29``;
  timestamptz as epoch-micros long).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Driver test star (FIXTURES.md §A)
# --------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON string, e.g. {"k": 87}
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

STAR: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --------------------------------------------------------------------------
# Banking OLTP trio (reference SCHEMA.sql:2-29)
# --------------------------------------------------------------------------

BANKING_CUSTOMERS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("email", T.StringType()),  # UNIQUE (SCHEMA.sql:6)
        T.StructField("created_at", T.TimestampType()),
    ]
)

BANKING_ACCOUNTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("customer_id", T.LongType()),  # FK -> customers (SCHEMA.sql:13)
        T.StructField("account_type", T.StringType()),
        T.StructField("balance", T.DecimalType(18, 2)),  # >= 0 (SCHEMA.sql:15)
        T.StructField("currency", T.StringType()),  # CHAR(3) default USD
        T.StructField("created_at", T.TimestampType()),
    ]
)

BANKING_TRANSACTIONS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),  # BIGSERIAL (SCHEMA.sql:22)
        T.StructField("account_id", T.LongType()),  # FK -> accounts (SCHEMA.sql:23)
        T.StructField("txn_type", T.StringType()),
        T.StructField("amount", T.DecimalType(18, 2)),  # > 0 (SCHEMA.sql:25)
        T.StructField("related_account_id", T.LongType()),  # nullable self-FK (:26)
        T.StructField("status", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)

BANKING: dict[str, T.StructType] = {
    "customers": BANKING_CUSTOMERS,
    "accounts": BANKING_ACCOUNTS,
    "transactions": BANKING_TRANSACTIONS,
}

# Wire types on the CDC stream: NUMERIC(18,2) travels as double
# (decimal.handling.mode=double, Connector_post_and_generate.py:29) and
# timestamptz as epoch-microseconds.  The silver layer casts back
# (functions.scalar.to_money / micros_to_ts).
_CDC_ROW_FIELDS = {
    "customers": [
        T.StructField("id", T.LongType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("created_at", T.LongType()),
    ],
    "accounts": [
        T.StructField("id", T.LongType()),
        T.StructField("customer_id", T.LongType()),
        T.StructField("account_type", T.StringType()),
        T.StructField("balance", T.DoubleType()),
        T.StructField("currency", T.StringType()),
        T.StructField("created_at", T.LongType()),
    ],
    "transactions": [
        T.StructField("id", T.LongType()),
        T.StructField("account_id", T.LongType()),
        T.StructField("txn_type", T.StringType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("related_account_id", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("created_at", T.LongType()),
    ],
}


def cdc_row_schema(table: str) -> T.StructType:
    """Wire-type row schema for one banking table (doubles + epoch-micros)."""
    return T.StructType(_CDC_ROW_FIELDS[table])


def cdc_envelope(table: str) -> T.StructType:
    """Debezium envelope schema for one banking table.

    Shape per reference ``consumer/consumer.py:66-67`` with JSON
    schemas disabled (``docker-compose.yml:44-45``):
    ``{"payload": {"before", "after", "op", "ts_ms", "source"}}``.
    """
    row = T.StructType(_CDC_ROW_FIELDS[table])
    payload = T.StructType(
        [
            T.StructField("before", row),
            T.StructField("after", row),
            T.StructField("op", T.StringType()),  # c/u/d/r
            T.StructField("ts_ms", T.LongType()),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("table", T.StringType()),
                        T.StructField("lsn", T.LongType()),
                    ]
                ),
            ),
        ]
    )
    return T.StructType([T.StructField("payload", payload)])


# Kafka-record shape the streaming layer consumes: (topic, value-json).
# Topic naming per reference Connector_post_and_generate.py:23-24.
TOPIC_PREFIX = "banking_server.public"
KAFKA_RECORD = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

# The generator's nested address dict (reference generator.py:125-133),
# built but never persisted — kept as the nested-type extension surface.
ADDRESS = T.StructType(
    [
        T.StructField("street", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("postal_code", T.StringType()),
        T.StructField("country", T.StringType()),
    ]
)
