"""ditto_spark — a from-scratch, PySpark-native entity-resolution engine.

Re-creates the capabilities of the reference Ditto fork (safoinme/ditto,
read-only at /root/reference) as an idiomatic Spark DataFrame pipeline:

    docs (interleaved text+media spans)
      -> serialize (COL/VAL)          ditto_spark.operators.serialize
      -> summarize (TF-IDF budget)    ditto_spark.operators.summarize
      -> dk-inject (typed tokens)     ditto_spark.operators.knowledge
      -> block (key / sorted-nbhd /   ditto_spark.operators.blocking
                minhash-LSH joins)
      -> score (pandas iterator UDF)  ditto_spark.operators.scoring
      -> cluster (connected comps)    ditto_spark.operators.clustering
      -> checkpointed sinks + lineage ditto_spark.sources.checkpoint

Everything is DataFrame-first: native column expressions where possible,
Arrow-vectorized pandas UDFs where Python is genuinely required, no
row-at-a-time Python UDFs, no collect() of data in any operator.
"""

__version__ = "0.1.0"
