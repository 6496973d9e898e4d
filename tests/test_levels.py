"""Dremel-paper level goldens — the exact expected arrays the reference pins
(/root/reference/data_store_test.go:104-346, FIXTURES.md F4)."""

from parquet_go_ray.functions.levels import Node, assemble_from_levels, fix_levels, shred_to_levels


def document_schema() -> Node:
    return Node("Document", "required", [
        Node("DocId", "required"),
        Node("Links", "optional", [
            Node("Backward", "repeated"),
            Node("Forward", "repeated"),
        ]),
        Node("Name", "repeated", [
            Node("Language", "repeated", [
                Node("Code", "required"),
                Node("Country", "optional"),
            ]),
            Node("Url", "optional"),
        ]),
    ])


R1 = {
    "DocId": 10,
    "Links": {"Forward": [20, 40, 60]},
    "Name": [
        {"Language": [{"Code": 1, "Country": 100}, {"Code": 2}], "Url": 10},
        {"Url": 11},
        {"Language": [{"Code": 3, "Country": 101}]},
    ],
}
R2 = {
    "DocId": 20,
    "Links": {"Backward": [10, 30], "Forward": [80]},
    "Name": [{"Url": 12}],
}


def test_max_levels():
    root = document_schema()
    fix_levels(root)
    name = root.children[2]
    lang = name.children[0]
    assert (name.max_r, name.max_d) == (1, 1)
    assert (lang.max_r, lang.max_d) == (2, 2)
    assert (lang.children[0].max_r, lang.children[0].max_d) == (2, 2)  # Code
    assert (lang.children[1].max_r, lang.children[1].max_d) == (2, 3)  # Country
    links = root.children[1]
    assert (links.max_r, links.max_d) == (0, 1)
    assert (links.children[1].max_r, links.children[1].max_d) == (1, 2)  # Forward


def test_dremel_paper_goldens():
    streams = shred_to_levels([R1, R2], document_schema())

    code = streams["Name.Language.Code"]
    assert [v for v in code["values"] if v is not None] == [1, 2, 3]
    assert code["dlevels"][:4] == [2, 2, 1, 2]
    assert code["rlevels"][:4] == [0, 2, 1, 1]

    country = streams["Name.Language.Country"]
    assert country["dlevels"][:4] == [3, 2, 1, 3]
    assert country["rlevels"][:4] == [0, 2, 1, 1]
    assert [v for v in country["values"] if v is not None] == [100, 101]

    url = streams["Name.Url"]
    assert url["dlevels"][:3] == [2, 2, 1]
    assert url["rlevels"][:3] == [0, 1, 1]

    fwd = streams["Links.Forward"]
    assert fwd["values"] == [20, 40, 60, 80]
    assert fwd["dlevels"] == [2, 2, 2, 2]
    assert fwd["rlevels"] == [0, 1, 1, 0]

    bwd = streams["Links.Backward"]
    assert bwd["values"] == [None, 10, 30]
    assert bwd["dlevels"] == [1, 2, 2]
    assert bwd["rlevels"] == [0, 0, 1]

    docid = streams["DocId"]
    assert docid["values"] == [10, 20]
    assert docid["dlevels"] == [0, 0]
    assert docid["rlevels"] == [0, 0]


def test_assembly_roundtrip():
    root = document_schema()
    streams = shred_to_levels([R1, R2], root)
    out = assemble_from_levels(streams, document_schema(), 2)
    # canonicalize: empty repeated == absent; missing optional == None
    assert out[0]["DocId"] == 10
    assert out[0]["Links"] == {"Backward": [], "Forward": [20, 40, 60]}
    assert out[0]["Name"][0] == {"Language": [{"Code": 1, "Country": 100}, {"Code": 2, "Country": None}], "Url": 10}
    assert out[0]["Name"][1] == {"Language": [], "Url": 11}
    assert out[0]["Name"][2] == {"Language": [{"Code": 3, "Country": 101}], "Url": None}
    assert out[1]["DocId"] == 20
    assert out[1]["Links"] == {"Backward": [10, 30], "Forward": [80]}
    assert out[1]["Name"] == [{"Language": [], "Url": 12}]


def test_empty_parent_and_zero_rlevel_edges():
    # reference edge cases at data_store_test.go:391-429
    root = Node("msg", "required", [
        Node("a", "repeated", [Node("b", "optional")]),
    ])
    streams = shred_to_levels([{"a": []}, {"a": [{"b": 1}, {}]}], root)
    s = streams["a.b"]
    assert s["dlevels"] == [0, 2, 1]
    assert s["rlevels"] == [0, 0, 1]
    out = assemble_from_levels(streams, root, 2)
    assert out[0] == {"a": []}
    assert out[1] == {"a": [{"b": 1}, {"b": None}]}
