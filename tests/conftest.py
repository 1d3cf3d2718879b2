import os
import shutil

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("voyagr-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf():
    from voyagr_spark.corpus import generate_corpus

    return generate_corpus(300, seed=42)


@pytest.fixture(scope="session")
def built_index(spark, corpus_pdf, tmp_path_factory):
    """Index over the 300-doc fixture corpus, 4 segments."""
    from voyagr_spark.indexer import build_index

    d = tmp_path_factory.mktemp("index")
    docs = spark.createDataFrame(corpus_pdf).repartition(6)
    idx = build_index(spark, docs, str(d), num_segments=4)
    yield idx
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def oracle_index(corpus_pdf):
    from voyagr_spark.oracle import OracleIndex

    return OracleIndex(corpus_pdf)
