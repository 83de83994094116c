"""mCIDE catalog golden tests (reference mcide.py:13-98, R23-R27):
filename round-trip, 00_ exclusion, value order, duplicate rejection,
staged write."""

from __future__ import annotations

import os

import pytest

from sparkclif.clif import mcide as MC

FIXTURE_FILES = {
    "vitals/clif_vitals_vital_category_categories.csv": "heart_rate\nsbp\n spo2 \n\n",
    "labs/clif_labs_lab_category_categories.csv": "sodium\npotassium\n",
    "labs/clif_labs_lab_specimen_categories.csv": "blood\nurine\n",
    # underscore table name: prefix strip must use the full table name,
    # not '^clif_[^_]+_' (ADVICE r01 medium)
    "respiratory_support/clif_respiratory_support_device_category_categories.csv": (
        "imv\nnippv\nhigh_flow_nc\n"
    ),
    "00_template/clif_00_template_x_categories.csv": "placeholder\n",
    "vitals/README.md": "not a categories file\n",
}


@pytest.fixture(scope="module")
def mcide_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("mcide")
    for rel, body in FIXTURE_FILES.items():
        p = base / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(body)
    return str(base)


@pytest.fixture(scope="module")
def catalog(spark, mcide_dir):
    return MC.read_catalog(spark, mcide_dir).cache()


def test_list_tables_excludes_00(spark, catalog):
    assert MC.list_tables(catalog) == ["labs", "respiratory_support", "vitals"]


def test_variable_filename_roundtrip(spark, catalog):
    assert MC.list_variables(catalog, "labs") == ["lab_category", "lab_specimen"]
    assert MC.list_variables(catalog, "vitals") == ["vital_category"]
    # underscore table: 'device_category', NOT 'support_device_category'
    assert MC.list_variables(catalog, "respiratory_support") == ["device_category"]
    assert MC.list_values(catalog, "respiratory_support", "device_category") == [
        "imv",
        "nippv",
        "high_flow_nc",
    ]


def test_values_trimmed_ordered_blankless(spark, catalog):
    # ' spo2 ' trimmed, trailing blank line dropped, file order kept
    assert MC.list_values(catalog, "vitals", "vital_category") == [
        "heart_rate",
        "sbp",
        "spo2",
    ]
    assert MC.list_values(catalog, "labs", "nope") == []


def test_append_duplicate_rejected(spark, catalog):
    with pytest.raises(MC.DuplicateValueError, match="already exists"):
        MC.append_value(catalog, "vitals", "vital_category", "sbp")


def test_append_preserves_order_and_stages(spark, catalog, mcide_dir):
    new_cat, contents = MC.append_value(catalog, "vitals", "vital_category", "map")
    assert contents == "heart_rate\nsbp\nspo2\nmap\n"  # order + trailing \n
    assert MC.list_values(new_cat, "vitals", "vital_category")[-1] == "map"
    staged = MC.stage_change(mcide_dir, "vitals", "vital_category", contents)
    assert os.path.exists(staged)
    assert open(staged).read() == contents
