"""Source adapters: testdata tables -> pipeline input shapes."""

from nilinker_spark.sources.webtext import webtext_from_documents  # noqa: F401
