"""Reference-parity flattening: Spark idioms vs a pure-python golden.

The golden flattener below re-implements the reference's semantics
(reference: process.py:42-103, claims.py:37-213) directly over parsed
JSON, independently of the Spark operator code -- so agreement means
our explode/unnest/join pipeline reproduces the reference's
entity->rows mapping.
"""

from __future__ import annotations

import json

import pytest

from wikidata_pq_spark import datagen
from wikidata_pq_spark.operators import flatten


@pytest.fixture(scope="module")
def entity_rows():
    return datagen.gen_entity_rows(40, seed=42)


@pytest.fixture(scope="module")
def sdf(spark, entity_rows):
    return spark.createDataFrame(entity_rows)


def golden_labels(pdf, column):
    out = []
    for _, r in pdf.iterrows():
        for v in json.loads(r[column]).values():
            out.append((r["id"], v["language"], v["value"]))
    return sorted(out)


def golden_aliases(pdf):
    out = []
    for _, r in pdf.iterrows():
        if r["aliases"] is None:
            continue
        for vs in json.loads(r["aliases"]).values():
            for v in vs:
                out.append((r["id"], v["language"], v["value"]))
    return sorted(out)


def golden_links(pdf):
    out = []
    for _, r in pdf.iterrows():
        for v in json.loads(r["sitelinks"]).values():
            out.append((r["id"], v["site"], v["title"]))
    return sorted(out)


def golden_claims(pdf):
    out = []
    for _, r in pdf.iterrows():
        for claim_list in json.loads(r["claims"]).values():
            for cl in claim_list:
                ms = cl["mainsnak"]
                dv, pl = ms["datavalue"], ms["property_labels"]
                common = (r["id"], ms["property"], ms["datatype"], cl["rank"])
                if ms["datatype"] == "wikibase-item":
                    for lang, plabel in pl.items():
                        if lang in dv["labels"]:
                            out.append(
                                common
                                + (lang, plabel, dv["value_id"], None, None, None,
                                   dv["labels"][lang])
                            )
                elif ms["datatype"] == "quantity":
                    ul = dv.get("unit_labels") or {}
                    if ul:
                        for lang, plabel in pl.items():
                            if lang in ul:
                                out.append(
                                    common
                                    + (lang, plabel, None, None, dv["amount"],
                                       dv["unit"], ul[lang])
                                )
                    else:
                        for lang, plabel in pl.items():
                            out.append(
                                common + (lang, plabel, None, None, dv["amount"], None, None)
                            )
                elif ms["datatype"] == "string":
                    for lang, plabel in pl.items():
                        out.append(
                            common + (lang, plabel, None, dv["value_str"], None, None, None)
                        )
                else:  # monolingualtext
                    lang = dv["language"]
                    if lang in pl:
                        out.append(
                            common + (lang, pl[lang], None, dv["text"], None, None, None)
                        )
    return sorted(map(str, out))


def test_labels_descriptions(sdf, entity_rows):
    got = sorted(map(tuple, flatten.flatten_labels(sdf, "labels").toPandas().values))
    assert got == golden_labels(entity_rows, "labels")
    got_d = sorted(
        map(tuple, flatten.flatten_labels(sdf, "descriptions").toPandas().values)
    )
    assert got_d == golden_labels(entity_rows, "descriptions")


def test_aliases_null_rows_dropped(sdf, entity_rows):
    got = sorted(map(tuple, flatten.flatten_aliases(sdf).toPandas().values))
    assert got == golden_aliases(entity_rows)
    n_null = entity_rows["aliases"].isna().sum()
    assert n_null > 0  # fixture exercises the null path


def test_links(sdf, entity_rows):
    got = sorted(map(tuple, flatten.flatten_links(sdf).toPandas().values))
    assert got == golden_links(entity_rows)


def test_claims_four_branches(sdf, entity_rows):
    pdf = flatten.flatten_claims(sdf).toPandas()
    assert set(pdf["datatype"]) == {
        "wikibase-item", "quantity", "string", "monolingualtext"
    }
    import pandas as pd

    def _n(v):
        return None if (v is None or (isinstance(v, float) and pd.isna(v))) else v

    got = sorted(
        str(
            (
                r["id"], r["property"], r["datatype"], r["rank"], r["language"],
                _n(r["property_label"]), _n(r["value_id"]), _n(r["value_str"]),
                _n(r["amount"]), _n(r["unit"]), _n(r["datavalue_label"]),
            )
        )
        for _, r in pdf.iterrows()
    )
    assert got == golden_claims(entity_rows)


def test_id_preservation_audit(sdf, entity_rows):
    """The reference's (currently commented) ID-preservation check
    (reference: process.py:106-108): labels/links keep every id;
    aliases exempt (null rows dropped by design)."""
    n_ids = entity_rows["id"].nunique()
    assert flatten.flatten_labels(sdf, "labels").select("id").distinct().count() == n_ids
    assert flatten.flatten_links(sdf).select("id").distinct().count() == n_ids
    n_alias_ids = flatten.flatten_aliases(sdf).select("id").distinct().count()
    assert n_alias_ids == (entity_rows["aliases"].notna()).sum()
