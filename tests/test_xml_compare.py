"""XML source round-trip + compound-nested-key compare parity.

Reproduces the reference's golden XML scenario (compound key
``id,id2,ckey.value``, diff pinned by ``example12_diff.json``;
``DatasetComparatorJobSuite.scala:240-270``) on Spark 4's built-in XML
source (spark-xml was merged upstream, so ``format("xml")`` needs no
extra package).  The fixture rows are synthesized to match the golden
scenario's shape: 9 rows keyed (id, id2, ckey.value), two value edits,
two name edits, and one key replaced (b9 -> b10) so each side has one
unmatched row.
"""

import pytest
from pyspark.sql import functions as F

from hermes_spark import ComparisonConfig, compare

ROW = (
    '<row schemaVersion="1.0.0"><id>{id}</id><id2>{id2}</id2>'
    "<ckey><key>a</key><value>{ck}</value></ckey>"
    "<name>{name}</name><value>{val}</value></row>"
)

# (id, id2, ckey.value, name, value) per side
REF_ROWS = [
    (1, 1, "b1", "AAA", "77.222"),
    (1, 2, "b2", "BBB", "11.2"),
    (1, 1, "b3", "CCC", "18.998"),
    (2, 1, "b4", "DDD", "1000000.1"),
    (2, 2, "b5", "EEE", "-9123"),
    (2, 1, "b6", "FFF", "0"),
    (3, 1, "b7", "GGG", "-1"),
    (3, 2, "b8", "GGG", "14.122334"),
    (3, 1, "b9", "GGG", "812"),
]
NEW_ROWS = [
    (1, 1, "b1", "AAA", "77.1"),  # value changed
    (1, 2, "b2", "BBB", "11.1"),  # value changed
    (1, 1, "b3", "CCC", "18.998"),
    (2, 1, "b4", "DDD1", "1000000.1"),  # name changed
    (2, 2, "b5", "EEE2", "-9123"),  # name changed
    (2, 1, "b6", "FFF", "0"),
    (3, 1, "b7", "GGG", "-1"),
    (3, 2, "b8", "GGG", "14.122334"),
    (3, 1, "b10", "GGG", "812"),  # key replaced: unmatched on both sides
]

# reference quirk: errCol lists flattened leaf columns in REVERSED order
FULL_ERRCOL = ["value", "name", "id2", "id", "ckey_value", "ckey_key", "_schemaVersion"]


def write_xml(path, rows):
    with open(path, "w") as fh:
        fh.write("<rows>\n")
        for r in rows:
            fh.write(
                ROW.format(id=r[0], id2=r[1], ck=r[2], name=r[3], val=r[4]) + "\n"
            )
        fh.write("</rows>\n")


@pytest.fixture(scope="module")
def xml_pair(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("xml_compare")
    ref_p, new_p = str(d / "ref.xml"), str(d / "new.xml")
    write_xml(ref_p, REF_ROWS)
    write_xml(new_p, NEW_ROWS)
    read = lambda p: spark.read.format("xml").option("rowTag", "row").load(p)
    return read(ref_p), read(new_p)


def test_xml_reader_schema(xml_pair):
    ref, _ = xml_pair
    # attribute comes through as _schemaVersion, nested element as struct
    assert "_schemaVersion" in ref.columns
    assert ref.schema["ckey"].dataType.typeName() == "struct"
    assert ref.count() == 9


@pytest.mark.parametrize("mode", ["reference", "fast"])
def test_xml_compound_key_diff_matches_golden(spark, xml_pair, mode):
    ref, new = xml_pair
    result = compare(
        ref, new, keys=["id", "id2", "ckey.value"], config=ComparisonConfig(mode=mode)
    )
    assert not result.passed
    assert result.diff_count == 6

    diff = result.result_df
    rows = {
        (
            r["expected_ckey"]["value"] if r["expected_id"] is not None else None,
            r["actual_ckey"]["value"] if r["actual_id"] is not None else None,
        ): list(r["errCol"])
        for r in diff.collect()
    }
    assert rows == {
        ("b1", "b1"): ["value"],
        ("b2", "b2"): ["value"],
        ("b4", "b4"): ["name"],
        ("b5", "b5"): ["name"],
        ("b9", None): FULL_ERRCOL,
        (None, "b10"): FULL_ERRCOL,
    }

    # struct columns survive intact on both sides of the diff output
    kept = diff.filter(F.col("expected_id").isNotNull() & F.col("actual_id").isNotNull())
    assert kept.filter(F.col("expected_ckey.key") != "a").count() == 0


def test_xml_identical_passes(spark, xml_pair):
    ref, _ = xml_pair
    result = compare(ref, ref, keys=["id", "id2", "ckey.value"])
    assert result.passed and result.diff_count == 0
