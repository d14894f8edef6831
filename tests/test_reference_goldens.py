"""Reference golden cases ported 1:1 (the behavior the reference pins with
its Go test suite; SURVEY.md §5):

- formatLine goldens (util_test.go:67-161) -> functions.textnorm.format_line
- qviews rollup golden (qviews_test.go:13-45: sitelink dim x 2 pageview
  fact streams -> exactly Q72:13, Q7197:60) -> broadcast-lookup + rollup
- stats golden (stats_test.go:15-55: exact Median/Samples JSON) ->
  stages.stats.reference_stats
"""

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from wikidata_qrank_ray.functions.textnorm import format_line
from wikidata_qrank_ray.stages.stats import reference_stats

FORMAT_LINE_GOLDENS = [
    ("als", "wikipedia", "Wähe", "Q2595950", "gsw.wikipedia/wähe Q2595950"),
    ("az", "wikipedia", "Bakı", "Q9248", "az.wikipedia/bakı Q9248"),
    ("az", "wikipedia", "BAKI", "Q9248", "az.wikipedia/bakı Q9248"),
    ("azx", "wikipedia", "BAKI", "Q9248", "azx.wikipedia/baki Q9248"),
    ("bat_smg", "wikipedia", "Metā", "Q577", "sgs.wikipedia/metā Q577"),
    ("bat-smg", "wikipedia", "Metā", "Q577", "sgs.wikipedia/metā Q577"),
    ("be_x_old", "wikipedia", "Год", "Q577", "be-tarask.wikipedia/год Q577"),
    ("cbk_zam", "wikipedia", "Zamboanga Chavacano", "Q32174903",
     "cbk-x-zam.wikipedia/zamboanga_chavacano Q32174903"),
    ("cbk-zam", "wikipedia", "Zamboanga Chavacano", "Q32174903",
     "cbk-x-zam.wikipedia/zamboanga_chavacano Q32174903"),
    ("commons", "wikimedia", "Zwolle", "Q793", "und.commons/zwolle Q793"),
    ("de", "wikipedia", "BAKI", "Q9248", "de.wikipedia/baki Q9248"),
    ("de", "wikipedia", "Straße", "Q34442", "de.wikipedia/strasse Q34442"),
    ("fiu_vro", "wikipedia", "Aastak", "Q577", "vro.wikipedia/aastak Q577"),
    ("fiu-vro", "wikipedia", "Aastak", "Q577", "vro.wikipedia/aastak Q577"),
    ("incubator", "wikipedia", "Wp/cpx/Teng-cing-chī", "Q11736",
     "cpx.wikipedia/teng-cing-chī Q11736"),
    ("map_bms", "wikipedia", "Banyumasan", "Q33219", "jv-x-bms.wikipedia/banyumasan Q33219"),
    ("map-bms", "wikipedia", "Banyumasan", "Q33219", "jv-x-bms.wikipedia/banyumasan Q33219"),
    ("media", "mediawiki", "MediaWiki", "Q5296", "und.mediawiki/mediawiki Q5296"),
    ("meta", "wikimedia", "Main Page", "Q5296", "und.metawiki/main_page Q5296"),
    ("nds_nl", "wikipedia", "Zwolle", "Q793", "nds-NL.wikipedia/zwolle Q793"),
    ("nds-nl", "wikipedia", "Zwolle", "Q793", "nds-NL.wikipedia/zwolle Q793"),
    ("roa_rup", "wikipedia", "Anu", "Q577", "rup.wikipedia/anu Q577"),
    ("roa-rup", "wikipedia", "Anu", "Q577", "rup.wikipedia/anu Q577"),
    ("roa_tara", "wikipedia", "Àrvule", "Q10884", "nap-x-tara.wikipedia/àrvule Q10884"),
    ("roa-tara", "wikipedia", "Àrvule", "Q10884", "nap-x-tara.wikipedia/àrvule Q10884"),
    ("simple", "wikipedia", "Tianjin", "Q11736", "en-x-simple.wikipedia/tianjin Q11736"),
    ("sources", "wikipedia", "Author:蒋中正", "Q16574", "und.wikisource/author:蒋中正 Q16574"),
    ("species", "wiki", "Aepyceros melampus", "Q132576",
     "und.wikispecies/aepyceros_melampus Q132576"),
    ("tr", "wikipedia", "Diyarbakır", "Q83387", "tr.wikipedia/diyarbakır Q83387"),
    ("tr", "wikipedia", "DİYARBAKIR", "Q83387", "tr.wikipedia/diyarbakır Q83387"),
    ("xx", "wikipedia", "Space C", "U+0020", "xx.wikipedia/space_c U+0020"),
    ("xx", "wikipedia", "Tab\tC", "U+0007", "xx.wikipedia/tab_c U+0007"),
    ("xx", "wikipedia", "Zero\x00C", "U+0000", "xx.wikipedia/zero_c U+0000"),
    ("zh_classical", "wikipedia", "尚書", "Q875313", "lzh.wikipedia/尚書 Q875313"),
    ("zh-classical", "wikipedia", "尚書", "Q875313", "lzh.wikipedia/尚書 Q875313"),
    ("zh_min_nan", "wikipedia", "Nî", "Q577", "nan.wikipedia/nî Q577"),
    ("zh-min-nan", "wikipedia", "Nî", "Q577", "nan.wikipedia/nî Q577"),
    ("zh_yue", "wikipedia", "天津", "Q11736", "yue.wikipedia/天津 Q11736"),
    ("zh-yue", "wikipedia", "天津", "Q11736", "yue.wikipedia/天津 Q11736"),
    ("", "commons", "Zwolle", "Q793", "und.commons/zwolle Q793"),
    ("", "wikidatawiki", "Project chat", "Q16503", "und.wikidata/project_chat Q16503"),
    ("", "wikimaniawiki", "Wikimania", "Q5296", "und.wikimania/wikimania Q5296"),
]


def test_format_line_goldens():
    for lang, site, title, value, expected in FORMAT_LINE_GOLDENS:
        got = format_line(lang, site, title, value)
        assert got == expected, f"({lang},{site},{title!r}): {got!r} != {expected!r}"


def test_qviews_rollup_golden():
    """qviews_test.go:13-45 translated: sitelinks dim broadcast, two
    pageview fact streams, per-entity sum; views without a sitelink and
    sitelinks without views both drop; output in numeric-qid order."""
    sitelinks = {
        "af.wikipedia/wards_of_the_city_of_london": "Q7969215",
        "am.wikipedia/ዙሪክ": "Q72",
        "az.wikipedia/simona_de_bovuar": "Q7197",
        "az.wikipedia/sürix": "Q72",
    }
    pv1 = [("am.wikipedia/ዙሪክ", 7), ("az.wikipedia/simona_de_bovuar", 2)]
    pv2 = [
        ("am.wikipedia/ዙሪክ", 1),
        ("az.wikipedia/simona_de_bovuar", 58),
        ("az.wikipedia/sürix", 5),
        ("ca.wikipedia/winterthur", 11),
    ]
    views = ray.data.from_items(
        [{"key": k, "count": c} for k, c in pv1 + pv2]
    )
    dim_ref = ray.put(sitelinks)

    def lookup(batch: pd.DataFrame) -> pd.DataFrame:
        dim = ray.get(dim_ref)
        out = pd.DataFrame(
            {"qid": batch["key"].map(dim), "cnt": batch["count"]}
        ).dropna()
        return out.groupby("qid", as_index=False)["cnt"].sum()

    from wikidata_qrank_ray.stages.rank import qrank_order, rollup

    partial = views.map_batches(lookup, batch_format="pandas")
    agg = rollup(partial).to_pandas()
    agg["_qn"] = agg["qid"].str.slice(1).astype(int)
    agg = agg.sort_values("_qn")
    got = "\n".join(f"{q} {c}" for q, c in zip(agg["qid"], agg["mention_count"]))
    assert got == "Q72 13\nQ7197 60"


def test_stats_golden():
    """stats_test.go:15-55 exact golden."""
    rows = [
        ("Q1", 4721864130),
        ("Q2", 107330319),
        ("Q3", 69160330),
        ("Q4", 5111172),
        ("Q5", 51123),
        ("Q6", 156),
        ("Q7", 1),
        ("Q8", 1),
        ("Q9", 1),
    ]
    st = reference_stats(rows, top_n=2, num_samples=8)
    assert st == {
        "Median": 2,
        "Samples": [
            ["Q1", 1, 4721864130],
            ["Q2", 2, 107330319],
            ["Q5", 5, 51123],
            ["Q9", 9, 1],
        ],
    }
