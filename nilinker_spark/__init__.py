"""nilinker_spark — a from-scratch PySpark-native entity-resolution engine.

Re-creates the capabilities of lasigeBioTM/NILINKER (NIL-entity linking:
candidate generation + two-tower attention scoring + collective resolution)
as an idiomatic Spark pipeline:

    webtext(url, warc_ts, html, text, lang)
      -> extract mentions          (mapInPandas, byte-identical text per url)
      -> normalize + block         (salted hash keys + broadcast WC dict)
      -> pair generation           (within-block self-join, capped)
      -> pairwise scoring          (Arrow pandas UDF: attention phrase vecs,
                                    JVM-side cosine + levenshtein features)
      -> transitive clustering     (large-star/small-star connected components)

plus the training-data-pipeline operators a 100 TB webtext corpus needs
(dedup, similarity search, text analysis, multimodal plumbing).

Nothing here is a port: the reference is single-process TensorFlow/Java
(see SURVEY.md); every operator is re-expressed DataFrame-first so Catalyst
handles pushdown/pruning/broadcast and AQE handles skew.
"""

__version__ = "0.1.0"
