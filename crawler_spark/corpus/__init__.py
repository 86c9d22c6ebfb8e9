from crawler_spark.corpus.generator import make_corpus, write_corpus  # noqa: F401
