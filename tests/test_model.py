"""Typed lineage-graph model (foundation/model.py).

Reference-shaped suite (reference: tests/test_model.py): dataclass
construction, Mermaid export, and build_lineage_graph over nested
lineage dicts — plus integration against a real Context lineage.
"""

import numpy as np

from waveformanalysis_tpu.foundation.model import (
    EdgeModel,
    LineageGraphModel,
    NodeModel,
    PortModel,
    build_lineage_graph,
    get_plugin_dtypes,
    get_plugin_title,
)


class TestPortModel:
    def test_port_creation(self):
        port = PortModel(id="IN::df::0", name="basic_features", kind="in",
                         dtype="float32", parent_node_id="df", index=0)
        assert port.kind == "in"
        assert port.parent_node_id == "df"
        assert port.index == 0


class TestNodeModel:
    def test_node_creation_minimal(self):
        node = NodeModel(id="hit", key="hit", title="hit",
                         plugin_class="HitFinderPlugin", description="")
        assert node.depth == 0
        assert node.in_ports == []
        assert node.out_ports == []
        assert node.config == {}

    def test_node_creation_full(self):
        port = PortModel(id="OUT::hit::0", name="hit", kind="out",
                         dtype="f4", parent_node_id="hit", index=0)
        node = NodeModel(id="hit", key="hit", title="Hit Finder",
                         plugin_class="HitFinderPlugin",
                         description="finds peaks",
                         config={"height": 30.0}, out_ports=[port], depth=2)
        assert node.out_ports[0].name == "hit"
        assert node.config["height"] == 30.0
        assert node.depth == 2


class TestEdgeModel:
    def test_edge_creation(self):
        edge = EdgeModel(source_node_id="hit", source_port_id="OUT::hit::0",
                         target_node_id="df", target_port_id="IN::df::0",
                         dtype="structured")
        assert edge.dtype == "structured"

    def test_edge_default_dtype(self):
        edge = EdgeModel("a", "OUT::a::0", "b", "IN::b::0")
        assert edge.dtype == "unknown"


class TestLineageGraphModel:
    def test_empty_graph(self):
        model = LineageGraphModel()
        assert model.nodes == {}
        assert model.edges == []
        assert model.roots() == []
        assert model.max_depth() == 0

    def test_to_mermaid_empty(self):
        assert LineageGraphModel().to_mermaid() == "graph LR"

    def test_to_mermaid_with_nodes_and_edges(self):
        model = LineageGraphModel()
        model.nodes["hit"] = NodeModel(id="hit", key="hit", title="hit",
                                       plugin_class="HitFinderPlugin")
        model.nodes["df"] = NodeModel(id="df", key="df", title="df",
                                      plugin_class="DataFramePlugin")
        model.edges.append(EdgeModel("hit", "OUT::hit::0",
                                     "df", "IN::df::0", dtype="f4"))
        text = model.to_mermaid()
        assert text.startswith("graph LR")
        assert 'hit["hit<br/>(HitFinderPlugin)"]' in text
        assert 'hit -- "f4" --> df' in text

    def test_to_mermaid_sanitizes_special_chars(self):
        model = LineageGraphModel()
        model.nodes["wave[0].x"] = NodeModel(
            id="wave[0].x", key="wave[0].x", title="w",
            plugin_class="P")
        text = model.to_mermaid()
        assert "wave_0__x" in text
        assert "wave[0].x[" not in text


class TestBuildLineageGraph:
    def _linear_lineage(self):
        # df <- basic_features <- st_waveforms
        return {
            "plugin_class": "DataFramePlugin",
            "config": {"gain": 2.0},
            "depends_on": {
                "basic_features": {
                    "plugin_class": "BasicFeaturesPlugin",
                    "config": {},
                    "depends_on": {
                        "st_waveforms": {
                            "plugin_class": "WaveformsPlugin",
                            "config": {},
                            "depends_on": {},
                        }
                    },
                }
            },
        }

    def test_build_empty_lineage(self):
        model = build_lineage_graph({}, "solo")
        assert set(model.nodes) == {"solo"}
        assert model.nodes["solo"].plugin_class == "UnknownPlugin"
        assert model.edges == []

    def test_build_linear_chain(self):
        model = build_lineage_graph(self._linear_lineage(), "df")
        assert set(model.nodes) == {"df", "basic_features", "st_waveforms"}
        assert model.nodes["df"].depth == 0
        assert model.nodes["basic_features"].depth == 1
        assert model.nodes["st_waveforms"].depth == 2
        assert model.nodes["df"].config == {"gain": 2.0}
        # one edge per dependency, port-to-port
        assert len(model.edges) == 2
        e = {(x.source_node_id, x.target_node_id) for x in model.edges}
        assert e == {("basic_features", "df"),
                     ("st_waveforms", "basic_features")}
        for edge in model.edges:
            assert edge.source_port_id.startswith("OUT::")
            assert edge.target_port_id.startswith("IN::")
        assert model.roots() == ["st_waveforms"]

    def test_diamond_depth_is_longest_path(self):
        # s1_s2 <- {width <- hit <- waves, features <- waves}
        waves = {"plugin_class": "W", "config": {}, "depends_on": {}}
        lineage = {
            "plugin_class": "S",
            "config": {},
            "depends_on": {
                "width": {
                    "plugin_class": "WW", "config": {},
                    "depends_on": {
                        "hit": {"plugin_class": "H", "config": {},
                                "depends_on": {"waves": waves}},
                    },
                },
                "features": {"plugin_class": "F", "config": {},
                             "depends_on": {"waves": waves}},
            },
        }
        model = build_lineage_graph(lineage, "s1_s2")
        assert model.nodes["s1_s2"].depth == 0
        assert model.nodes["width"].depth == 1
        assert model.nodes["features"].depth == 1
        assert model.nodes["hit"].depth == 2
        # waves is reachable via features (depth 2) AND hit (depth 3):
        # longest path wins
        assert model.nodes["waves"].depth == 3
        assert model.max_depth() == 3

    def test_in_ports_sorted_and_typed(self):
        class _P:
            output_dtype = np.dtype("f4")
            input_dtype = None

        model = build_lineage_graph(self._linear_lineage(), "df",
                                    plugins={"basic_features": _P()})
        bf_out = model.nodes["basic_features"].out_ports[0]
        assert bf_out.dtype == "float32"
        df_in = model.nodes["df"].in_ports[0]
        assert df_in.name == "basic_features"
        assert df_in.dtype == "float32"


class TestHelpers:
    def test_get_plugin_dtypes_unknown(self):
        assert get_plugin_dtypes("nope", None) == ("unknown", "unknown")

    def test_get_plugin_dtypes_dict_input(self):
        class _P:
            output_dtype = "i2"
            input_dtype = {"st_waveforms": "i2"}

        in_s, out_s = get_plugin_dtypes("x", {"x": _P()})
        assert "st_waveforms" in in_s
        assert out_s == "int16"

    def test_get_plugin_title_prefers_attribute(self):
        class _P:
            title = "Fancy"

        assert get_plugin_title("x", {}, {"x": _P()}) == "Fancy"
        assert get_plugin_title("x", {"title": "From info"}, {}) == "From info"
        assert get_plugin_title("x", {}, {}) == "x"


class TestContextIntegration:
    def test_model_from_real_context_lineage(self, tmp_path):
        from waveformanalysis_tpu.context.context import Context
        from waveformanalysis_tpu.plugins.builtin.basic_features import (
            BasicFeaturesPlugin,
        )
        from waveformanalysis_tpu.plugins.builtin.dataframe import (
            DataFramePlugin,
        )

        ctx = Context(storage_dir=str(tmp_path),
                      config={"show_progress": False})
        ctx.register(BasicFeaturesPlugin(), DataFramePlugin())
        lineage = ctx.get_lineage("df")
        model = build_lineage_graph(lineage, "df",
                                    plugins=dict(ctx.plugins))
        assert "df" in model.nodes
        assert "basic_features" in model.nodes
        assert model.nodes["basic_features"].depth >= 1
        text = model.to_mermaid()
        assert "graph LR" in text and "df" in text
