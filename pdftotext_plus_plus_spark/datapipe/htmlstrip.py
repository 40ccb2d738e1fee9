"""HTML boilerplate stripping (north-rule surface: "HTML boilerplate strip,
DOM heuristics").

The extraction engine proper consumes layout payloads (the reference's
model); this module covers the raw-HTML side of a web-corpus pipeline: drop
script/style/head/nav/header/footer/aside subtrees, strip tags, decode the
common entities, squeeze whitespace — all JVM-side ``regexp_replace`` (no
UDFs), so it runs at scan speed at 10^12 rows.

A deterministic synthetic HTML corpus (``build_html_corpus``) feeds the
driver query; the oracle is a VALUES table of goldens computed by an
independent Python mirror (``strip_boilerplate_py``), so the Spark
expression chain is checked against a second implementation, not against
itself.
"""

from __future__ import annotations

import random
import re
from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_HTML_DOCS = 40

_DROP_TAGS = ("script", "style", "head", "nav", "header", "footer", "aside")
_ENTITIES = (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
             ("&quot;", '"'), ("&#39;", "'"))

_WORDS = ["data", "spark", "scale", "corpus", "tokens", "pages", "engine",
          "batch", "arrow", "columns", "filter", "join", "shuffle", "query"]


def build_html_corpus(n_docs: int = N_HTML_DOCS,
                      seed: int = 7) -> List[Tuple[str, str]]:
    """Deterministic (url, html) pages with boilerplate around real content."""
    rows = []
    for i in range(n_docs):
        rng = random.Random(seed * 7919 + i)
        paras = []
        for _ in range(rng.randint(1, 4)):
            words = [rng.choice(_WORDS) for _ in range(rng.randint(6, 14))]
            paras.append("<p>" + " ".join(words) + "</p>")
        title = " ".join(rng.choice(_WORDS) for _ in range(3))
        html = (
            "<html><head><title>%s</title>"
            "<script>var x = 1 &amp;&amp; 2;</script>"
            "<style>.a{color:red}</style></head>"
            "<body><nav><a href=\"/\">home</a> | <a href=\"/x\">x</a></nav>"
            "<header><h1>%s</h1></header>"
            "<div id=\"main\"><h2>%s &amp; more</h2>%s</div>"
            "<aside>ads &nbsp;here</aside>"
            "<footer>&copy; 2024 example</footer></body></html>"
            % (title, title, title, "".join(paras)))
        rows.append(("https://html.test/doc-%04d" % i, html))
    return rows


def strip_boilerplate_py(html: str) -> str:
    """Independent Python mirror of the strip chain (golden generator)."""
    out = html
    for tag in _DROP_TAGS:
        out = re.sub(r"(?s)<%s[^>]*>.*?</%s>" % (tag, tag), " ", out)
    out = re.sub(r"<[^>]*>", " ", out)
    for entity, repl in _ENTITIES:
        out = out.replace(entity, repl)
    out = re.sub(r"\s+", " ", out).strip()
    return out


def boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark expression chain over the synthetic HTML corpus."""
    df = spark.createDataFrame(build_html_corpus(), "url string, html string")
    col = F.col("html")
    for tag in _DROP_TAGS:
        col = F.regexp_replace(col, "(?s)<%s[^>]*>.*?</%s>" % (tag, tag), " ")
    col = F.regexp_replace(col, "<[^>]*>", " ")
    for entity, repl in _ENTITIES:
        # literal replacement via regexp_replace with escaped pattern
        col = F.regexp_replace(col, re.escape(entity), repl)
    col = F.trim(F.regexp_replace(col, r"\s+", " "))
    return df.select("url", col.alias("main_text"))


def boilerplate_strip_oracle_sql() -> str:
    values = ",\n".join(
        "('%s', '%s')" % (url, strip_boilerplate_py(html).replace("'", "''"))
        for url, html in build_html_corpus())
    return "SELECT * FROM (VALUES\n%s\n) AS t(url, main_text)" % values
