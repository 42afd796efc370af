"""Taxonomy codec/library tests (reference analog: tests/common/)."""

import json

import pytest

from mermaid_classifier_tpu.common.taxonomy import (
    BenthicAttributeLibrary,
    CoralNetMermaidMapping,
    GrowthFormLibrary,
    combine_ba_gf,
    split_ba_gf,
)
from tests.common.taxonomy_fixtures import (
    BA_RECORDS,
    GF_BY_ID,
    MAPPING_RECORDS,
    make_ba_library,
    make_gf_library,
    make_mapping,
)


class TestBAGFCodec:
    def test_roundtrip(self):
        assert combine_ba_gf("ba1", "gf1") == "ba1::gf1"
        assert split_ba_gf("ba1::gf1") == ("ba1", "gf1")

    def test_no_gf_keeps_separator(self):
        assert combine_ba_gf("ba1", "") == "ba1::"
        assert split_ba_gf("ba1::") == ("ba1", "")

    def test_invalid_inputs(self):
        with pytest.raises(ValueError, match="exactly once"):
            split_ba_gf("no-separator")
        with pytest.raises(ValueError, match="exactly once"):
            split_ba_gf("a::b::c")
        with pytest.raises(ValueError, match="left of the separator"):
            split_ba_gf("::gf")


class TestBALibrary:
    def test_lookups(self):
        lib = make_ba_library()
        assert lib.id_to_name("ba-acro") == "Acropora"
        assert lib.name_to_id("Porites") == "ba-porites"
        assert lib.id_to_name("") == ""
        assert lib.name_to_id("") == ""

    def test_ancestors_root_first(self):
        lib = make_ba_library()
        assert lib.get_ancestor_ids("ba-acro-tab") == ["ba-hard", "ba-acro"]
        assert lib.get_ancestor_ids("ba-hard") == []
        assert lib.top_level_ancestor("ba-acro-tab") == "ba-hard"
        assert lib.top_level_ancestor("ba-algae") == "ba-algae"

    def test_descendants_dfs_name_ordered(self):
        lib = make_ba_library()
        names = [r["name"] for r in lib.get_descendants("ba-hard")]
        assert names == ["Acropora", "Porites", "Acropora tabulate"]
        assert lib.get_descendants("ba-acro-tab") == []
        roots = [r["name"] for r in lib.get_descendants(None)]
        assert roots[:2] == ["Hard coral", "Macroalgae"]

    def test_bagf_id_to_name(self):
        lib = make_ba_library()
        gfs = make_gf_library()
        assert lib.bagf_id_to_name("ba-acro::gf-br", gfs) == "Acropora::branching"
        # BA-only names drop the separator.
        assert lib.bagf_id_to_name("ba-algae::", gfs) == "Macroalgae"

    def test_from_json_file(self, tmp_path):
        p = tmp_path / "ba.json"
        p.write_text(json.dumps({"results": BA_RECORDS}))
        lib = BenthicAttributeLibrary.from_json_file(str(p))
        assert lib.id_to_name("ba-hard") == "Hard coral"


class TestGFLibrary:
    def test_lookup(self):
        gfs = make_gf_library()
        assert gfs.id_to_name("gf-ma") == "massive"
        assert gfs.id_to_name("") == ""

    def test_from_json_file_both_shapes(self, tmp_path):
        p1 = tmp_path / "gf_dict.json"
        p1.write_text(json.dumps(GF_BY_ID))
        assert GrowthFormLibrary.from_json_file(str(p1)).id_to_name("gf-br") == "branching"
        p2 = tmp_path / "gf_list.json"
        p2.write_text(json.dumps([{"id": "g1", "name": "plates"}]))
        assert GrowthFormLibrary.from_json_file(str(p2)).id_to_name("g1") == "plates"


class TestCoralNetMapping:
    def test_lazy_lookup_and_empty_gf(self):
        mapping = make_mapping()
        assert "1001" in mapping
        entry = mapping["1001"]
        assert entry.benthic_attribute_id == "ba-acro"
        assert entry.growth_form_id == "gf-br"
        # None GF normalizes to ''.
        assert mapping["1002"].growth_form_id == ""
        assert mapping["1002"].growth_form_name == ""

    def test_helpful_keyerror(self):
        mapping = make_mapping()
        with pytest.raises(KeyError, match="CoralNet label ID"):
            mapping["9999"]

    def test_dataframe(self):
        df = make_mapping().get_dataframe()
        assert list(df.columns) == [
            "provider_label",
            "benthic_attribute_name",
            "growth_form_name",
            "provider_id",
            "benthic_attribute_id",
            "growth_form_id",
        ]
        assert len(df) == len(MAPPING_RECORDS)

    def test_loader_called_once(self):
        calls = []

        def loader():
            calls.append(1)
            return MAPPING_RECORDS

        mapping = CoralNetMermaidMapping(loader=loader)
        assert not calls  # lazy: nothing loaded at construction
        _ = mapping["1001"]
        _ = mapping["1002"]
        assert len(calls) == 1
