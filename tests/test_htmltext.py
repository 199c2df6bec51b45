"""HTML → text extraction (functions/htmltext.py): semantics, cross-engine
equality with the DuckDB twin, map-only plan pin."""

import duckdb
import pandas as pd
import pytest

from olake_spark.functions.htmltext import (
    extract_html_text,
    extract_html_text_sql,
    html_text_col,
    link_density_col,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


ROWS = [
    (
        1,
        '<html><head><title>T</title><style>p{x:1}</style>'
        "<script>if(1<2){a&&b}</script></head>"
        '<body><nav><a href="/">Home</a> <a href="/a">About &amp; Us</a></nav>'
        "<h1>Doc &quot;one&quot;</h1><p>Hello <b>bold</b> world.</p>"
        '<p>Read <a class="x" href="y">more here</a> now.</p>'
        "<!-- hidden --><br/><footer>&copy; 2026</footer></body></html>",
    ),
    (2, "plain text, no tags & no entities"),
    (3, "&amp;lt; stays encoded once: &lt;tag&gt; &#39;q&#39; &nbsp;sp"),
    (4, '<abbr title="x">HTML</abbr> is <i>not</i> an anchor <a>bare</a>'),
    (5, None),
    (6, ""),
    (7, "<p>broken < tag stays</p><div>next</div>"),
    (8, '<A HREF="up">Upper</A><P>case tags</P>'),
    (9, "<ul><li>one</li><li>two</li></ul><table><tr><td>c1</td><td>c2</td></tr></table>"),
    (10, "<noscript>js off</noscript><template><p>tpl</p></template>kept"),
]


@pytest.fixture(scope="module")
def extracted(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, html string")
    return {
        r["doc_id"]: r
        for r in extract_html_text(df).collect()
    }


class TestSemantics:
    def test_script_style_comment_removed(self, extracted):
        t = extracted[1]["text"]
        for leak in ("if(1<2)", "p{x:1}", "hidden", "<"):
            assert leak not in t, t
        assert t.startswith("T\nHome About & Us\n")

    def test_one_decode_round(self, extracted):
        # '&amp;lt;' decodes to '&lt;' (text), NEVER to '<'
        assert extracted[3]["text"] == "&lt; stays encoded once: <tag> 'q' sp"

    def test_inline_tags_join_block_tags_break(self, extracted):
        assert "Hello bold world." in extracted[1]["text"]
        assert extracted[9]["text"] == "one\ntwo\nc1\nc2"

    def test_plain_text_untouched(self, extracted):
        assert extracted[2]["text"] == "plain text, no tags & no entities"
        assert extracted[2]["link_density_ppm"] == 0

    def test_null_and_empty(self, extracted):
        assert extracted[5]["text"] is None
        assert extracted[5]["n_chars"] is None
        assert extracted[5]["link_density_ppm"] is None
        assert extracted[6]["text"] == ""
        assert extracted[6]["n_chars"] == 0
        assert extracted[6]["link_density_ppm"] == 0

    def test_malformed_lt_survives(self, extracted):
        assert extracted[7]["text"] == "broken < tag stays\nnext"

    def test_case_insensitive_tags(self, extracted):
        assert extracted[8]["text"] == "Upper\ncase tags"
        # 'Upper' (5 chars) of 'Upper\ncase tags' (15) → exact ppm
        assert extracted[8]["link_density_ppm"] == 333333

    def test_abbr_not_an_anchor(self, extracted):
        # only '<a>bare</a>' counts: 4 of 'HTML is not an anchor bare' = 26
        assert extracted[4]["link_density_ppm"] == 1000000 * 4 // 26

    def test_wholesale_containers(self, extracted):
        assert extracted[10]["text"] == "kept"


class TestCrossEngine:
    def test_twin_agrees_everywhere(self, spark):
        df = spark.createDataFrame(ROWS, "doc_id long, html string")
        got = (
            extract_html_text(df)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("src", pd.DataFrame(ROWS, columns=["doc_id", "html"]))
        want = (
            con.sql(extract_html_text_sql("SELECT * FROM src"))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.astype(str).equals(want.astype(str)), (
            got.compare(want) if got.shape == want.shape else (got, want)
        )


class TestPlan:
    def test_map_only(self, spark):
        df = spark.createDataFrame(ROWS, "doc_id long, html string")
        out = df.select(
            html_text_col("html"), link_density_col("html")
        )
        plan = plan_of(out)
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan


class TestFuzzTwin:
    def test_random_markup_cross_engine(self, spark):
        # seeded random soup over an HTML-ish alphabet: tags (well-formed,
        # unclosed, uppercase), entities (in-scope, out-of-scope, double-
        # encoded), bare < > &, newlines — the twin must agree on EVERY one
        import random

        rng = random.Random(20260821)
        frags = [
            "<p>", "</p>", "<div class='x'>", "</div>", "<br/>", "<b>",
            "</b>", "<a href=\"u\">", "</a>", "<a>", "</A>", "<ABBR>",
            "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
            "&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;", "&copy;",
            "&amp;lt;", "<", ">", "&", "plain", "words here", " ", "\n",
            "\t", "x<y", "a&&b", "<unclosed", "<h1>", "</h1>", "<li>",
            "</li>", "end.",
        ]
        rows = [
            (i, "".join(rng.choice(frags) for _ in range(rng.randint(1, 40))))
            for i in range(200)
        ]
        df = spark.createDataFrame(rows, "doc_id long, html string")
        got = (
            extract_html_text(df)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("soup", pd.DataFrame(rows, columns=["doc_id", "html"]))
        want = (
            con.sql(extract_html_text_sql("SELECT * FROM soup"))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        mism = (got.astype(str) != want.astype(str)).any(axis=1)
        assert not mism.any(), (
            rows[mism.idxmax()],
            got[mism].head(3),
            want[mism].head(3),
        )
