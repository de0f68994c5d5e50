"""ValidationManager: config, input-dtype, and output-contract validation.

Behavioral analog of the reference validation layer
(reference: core/execution/validation.py:26-120, wired into every plugin
execution at context_execution.py:293): invalid option values fail BEFORE
compute runs, declared input dtypes are checked against upstream data, and
output contracts reject malformed results.
"""

import numpy as np
import pytest

from waveformanalysis_tpu.context.context import Context
from waveformanalysis_tpu.dtypes.schema import Field, Schema
from waveformanalysis_tpu.dtypes.table import Table
from waveformanalysis_tpu.foundation.exceptions import ValidationError
from waveformanalysis_tpu.plugins.base import Option, Plugin

SCHEMA = Schema("vdata", (Field("v", "i4"), Field("channel", "i2")))


@pytest.fixture
def ctx(tmp_path):
    return Context(storage_dir=str(tmp_path), config={"show_progress": False})


class TestConfigValidation:
    def test_choice_violation_fails_before_compute(self, ctx):
        ran = []

        class P(Plugin):
            provides = "vc_data"
            options = {"mode": Option(default="a", type=str,
                                      choices=["a", "b"])}

            def compute(self, context, run_id, **kwargs):
                ran.append(1)
                return Table.zeros(0, SCHEMA)

        ctx.register(P())
        ctx.set_config({"vc_data": {"mode": "zzz"}})
        with pytest.raises(Exception, match="mode|choice"):
            ctx.get_data("r", "vc_data")
        assert not ran  # compute never started

    def test_range_violation(self, ctx):
        class P(Plugin):
            provides = "vr_data"
            options = {"n": Option(default=5, type=int, min_value=1, max_value=10)}

            def compute(self, context, run_id, **kwargs):
                return Table.zeros(0, SCHEMA)

        ctx.register(P())
        ctx.set_config({"vr_data": {"n": 99}})
        with pytest.raises(Exception, match="n|max|range"):
            ctx.get_data("r", "vr_data")

    def test_type_coercion_and_rejection(self, ctx):
        class P(Plugin):
            provides = "vt_data"
            options = {"f": Option(default=1.0, type=float)}

            def compute(self, context, run_id, **kwargs):
                val = context.get_config(self, "f")
                assert isinstance(val, float)
                return Table.zeros(0, SCHEMA)

        ctx.register(P())
        ctx.set_config({"vt_data": {"f": 2}})  # int coerces to float
        ctx.get_data("r", "vt_data")
        ctx.set_config({"vt_data": {"f": "not a number"}})
        with pytest.raises(Exception):
            ctx.get_data("r2", "vt_data")


class TestInputDtypeValidation:
    def test_declared_input_fields_enforced(self, ctx):
        class Source(Plugin):
            provides = "vi_src"
            save_when = "never"

            def compute(self, context, run_id, **kwargs):
                return np.zeros(3, dtype=[("other", "i4")])

        class Consumer(Plugin):
            provides = "vi_out"
            depends_on = ["vi_src"]
            input_dtype = {"vi_src": ["v"]}  # requires a 'v' field

            def compute(self, context, run_id, **kwargs):
                return Table.zeros(0, SCHEMA)

        ctx.register(Source(), Consumer())
        with pytest.raises(Exception, match="v|field|dtype"):
            ctx.get_data("r", "vi_out")

    def test_matching_input_passes(self, ctx):
        class Source(Plugin):
            provides = "vm_src"
            save_when = "never"

            def compute(self, context, run_id, **kwargs):
                return np.zeros(3, dtype=[("v", "i4"), ("channel", "i2")])

        class Consumer(Plugin):
            provides = "vm_out"
            depends_on = ["vm_src"]
            input_dtype = {"vm_src": ["v"]}
            save_when = "never"

            def compute(self, context, run_id, **kwargs):
                return Table.zeros(0, SCHEMA)

        ctx.register(Source(), Consumer())
        out = ctx.get_data("r", "vm_out")
        assert len(out) == 0


class TestOutputContract:
    def test_flat_channel_output_requires_channel_field(self, ctx):
        class Bad(Plugin):
            provides = "basic_features"  # a _FLAT_CHANNEL_OUTPUTS name

            def compute(self, context, run_id, **kwargs):
                return np.zeros(3, dtype=[("height", "f4")])  # no channel

        ctx.register(Bad())
        with pytest.raises(ValidationError, match="channel"):
            ctx.get_data("r", "basic_features")

    def test_flat_channel_output_accepts_table_with_channel(self, ctx):
        class Good(Plugin):
            provides = "basic_features"
            save_when = "never"

            def compute(self, context, run_id, **kwargs):
                return Table(
                    {"v": np.zeros(2, np.int32),
                     "channel": np.zeros(2, np.int16)},
                    schema=SCHEMA,
                )

        ctx.register(Good())
        out = ctx.get_data("r", "basic_features")
        assert "channel" in out

    def test_structured_output_dtype_converted(self, ctx):
        """A structured-array result with matching field names converts to
        the declared output dtype (reference: context_execution dtype
        conversion)."""
        target = np.dtype([("v", "<i8"), ("channel", "<i2")])

        class P(Plugin):
            provides = "vo_data"
            output_dtype = target
            save_when = "never"

            def compute(self, context, run_id, **kwargs):
                out = np.zeros(2, dtype=[("v", "<i4"), ("channel", "<i2")])
                out["v"] = [7, 8]
                return out

        ctx.register(P())
        out = ctx.get_data("r", "vo_data")
        assert out.dtype == target
        np.testing.assert_array_equal(out["v"], [7, 8])
