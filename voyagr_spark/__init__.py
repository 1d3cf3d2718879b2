"""voyagr_spark — a PySpark-native inverted-index + BM25 search engine.

A from-scratch reimplementation of the indexing and search core of the
reference engine (Apache Lucene/Solr 6.0.0 snapshot under the voyagr name,
see SURVEY.md), re-expressed Spark-first:

* analysis  — StandardAnalyzer-equivalent tokenize/lowercase/stop chain as
              vectorized pandas operations (reference:
              lucene/analysis/common/src/java/org/apache/lucene/analysis/
              standard/StandardAnalyzer.java:84-97)
* codec     — delta + varint posting-list blocks with a per-128-doc block
              directory (reference: codecs/lucene50/Lucene50PostingsWriter.java)
* smallfloat— the lossy 1-byte norm encoding (reference: util/SmallFloat.java:78-98)
* bm25      — BM25(k1=1.2, b=0.75) in float32 with Java-float cast parity
              (reference: search/similarities/BM25Similarity.java)
* indexer   — per-partition segment build via Arrow UDFs; global doc_id
              assignment; manifest + checkpoint-resumable stages
* merge     — tiered segment merging (reference: index/TieredMergePolicy.java:81-88)
* parser    — classic query parser subset: term, AND/OR, "phrase"
* search    — per-segment vectorized scoring (term/bool/phrase), MaxScore/
              block-max pruning, global top-k with Lucene tie-breaks
* oracle    — pure-Python float32 reference engine used as the golden oracle
"""

__version__ = "0.1.0"
