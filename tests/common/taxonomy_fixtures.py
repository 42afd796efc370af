"""Shared in-memory taxonomy fixtures (reference analog:
tests/pyspacer/metrics_test_helpers.py MockBALibrary — a small 2-level tree)."""

from mermaid_classifier_tpu.common.taxonomy import (
    BenthicAttributeLibrary,
    CoralNetMermaidMapping,
    GrowthFormLibrary,
)

# A 3-level tree:
#   hard-coral (root)
#     ├── acropora
#     │     └── acropora-tabulate
#     └── porites
#   macroalgae (root)
BA_RECORDS = [
    {"id": "ba-hard", "name": "Hard coral", "parent": None},
    {"id": "ba-acro", "name": "Acropora", "parent": "ba-hard"},
    {"id": "ba-acro-tab", "name": "Acropora tabulate", "parent": "ba-acro"},
    {"id": "ba-porites", "name": "Porites", "parent": "ba-hard"},
    {"id": "ba-algae", "name": "Macroalgae", "parent": None},
]

GF_BY_ID = {"gf-br": "branching", "gf-ma": "massive"}

MAPPING_RECORDS = [
    {
        "provider_id": "1001",
        "provider_label": "Acrop",
        "benthic_attribute_id": "ba-acro",
        "benthic_attribute_name": "Acropora",
        "growth_form_id": "gf-br",
        "growth_form_name": "branching",
    },
    {
        "provider_id": "1002",
        "provider_label": "Macro",
        "benthic_attribute_id": "ba-algae",
        "benthic_attribute_name": "Macroalgae",
        "growth_form_id": None,
        "growth_form_name": None,
    },
]


def make_ba_library() -> BenthicAttributeLibrary:
    return BenthicAttributeLibrary(BA_RECORDS)


def make_gf_library() -> GrowthFormLibrary:
    return GrowthFormLibrary(GF_BY_ID)


def make_mapping() -> CoralNetMermaidMapping:
    return CoralNetMermaidMapping.from_records(MAPPING_RECORDS)
