"""PySpark-native analytics engine with the query and data-processing
capabilities of ``kathyatskiv/Big-Data-2021-Spark-Streaming``.

The reference (at ``/root/reference``) is a Kafka + Spark Structured
Streaming pipeline over the Meetup RSVP firehose: a JSON decode layer,
a country filter (Q1, ``srapk_structure_streaming.py:63-64``), a
stream-static broadcast join against a US-states dimension (Q2,
``srapk_structure_streaming.py:139-143``) and a watermarked 1-minute
tumbling-window ``collect_set`` aggregation (Q3,
``srapk_structure_streaming.py:150-165``).

This package re-expresses those capability classes — and generalizes
them into a full batch + streaming operator surface designed for
100 TB scale — on idiomatic PySpark (DataFrame / SQL / Catalyst /
Structured Streaming). Nothing is ported from the reference's code;
only its observable semantics are reproduced.

Layout:
    session       — SparkSession factory with scale-aware defaults
    sources       — batch parquet catalog + streaming source surrogates
    functions     — scalar helpers shared by operators and oracles
    operators     — filters/joins/aggregates/windows/dedup/similarity/text
    plans         — named end-to-end queries (reference Q1-Q3 + analytics)
    streaming     — watermarked pipelines, sinks, stateful operators
"""

__version__ = "0.1.0"
