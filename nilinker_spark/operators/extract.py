"""S1 — mention extraction from webtext (Arrow-batched, byte-identical).

≙ the reference's corpus parsers (/root/reference/src/evanil/annotations.py:
56-307) which turn raw documents into per-doc mention dicts.  Here the
"parser" is a pure function over the html bytes (extract_text) plus a
greedy gazetteer scan (extract_mentions), both shared verbatim with the
oracle so extracted text is byte-identical per url.

Scale notes:
- ``lang == 'en'`` and the two-column projection are plain Catalyst
  filters/prunes — at 100 TB the parquet scan reads only (url, html)
  row groups for English partitions (PushedFilters visible in .explain).
- The gazetteer is a driver-side set broadcast once per executor —
  KB ≪ data, the same asymmetry the reference exploits with its
  in-memory WC dict (/root/reference/src/utils/utils.py:28-107).
- mapInPandas = Arrow record batches; no row-at-a-time Python UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nilinker_spark.functions.normalize import extract_text, norm_form
from nilinker_spark.oracle import extract_mentions

MENTIONS_SCHEMA = "url string, mention_id string, surface string, pos int, norm string"


def extract_mentions_df(spark: SparkSession, webtext: DataFrame, gazetteer: set[str]) -> DataFrame:
    """webtext(url, warc_ts, html, text, lang) -> mentions, English pages only."""
    gz = spark.sparkContext.broadcast(sorted(gazetteer))

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gset = set(gz.value)
        for pdf in batches:
            urls, mids, surfaces, poss, norms = [], [], [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = extract_text(bytes(html))
                for mid, surface, pos in extract_mentions(url, text, gset):
                    urls.append(url)
                    mids.append(mid)
                    surfaces.append(surface)
                    poss.append(pos)
                    norms.append(norm_form(surface))
            yield pd.DataFrame(
                {"url": urls, "mention_id": mids, "surface": surfaces, "pos": poss, "norm": norms}
            )

    return (
        webtext.filter(F.col("lang") == "en")
        .select("url", "html")
        .mapInPandas(scan, MENTIONS_SCHEMA)
    )


def extract_text_df(spark: SparkSession, webtext: DataFrame) -> DataFrame:
    """(url, extracted_text) — the byte-identical-extraction parity surface."""

    def ex(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "extracted_text": [extract_text(bytes(h)) for h in pdf["html"]],
                }
            )

    return webtext.select("url", "html").mapInPandas(ex, "url string, extracted_text string")
