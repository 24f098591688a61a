"""HLO-metadata attribution for the device-trace roofline tool
(tools/perf/trace_roofline.py): instruction parsing must survive
tuple-typed instructions and backend-config noise, event names must
reduce to instruction names (the axon device plane uses the FULL HLO
instruction text as the event name), and the stage classifier must route
module paths / named_scope markers / source files to the right stages.
No device work — pure text fixtures."""

import importlib.util
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "trace_roofline",
    os.path.join(os.path.dirname(__file__), "..", "tools", "perf",
                 "trace_roofline.py"))
tr = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("trace_roofline", tr)
_spec.loader.exec_module(tr)


HLO = """\
HloModule jit_infer, entry_computation_layout={()->()}

%fused_computation.29 (p0: f32[64,512], p1: bf16[64,750,512]) -> (f32[64,512], bf16[64,750,512]) {
  %p0 = f32[64,512]{1,0} parameter(0)
  %dot.1 = f32[64,512]{1,0} dot(%p0, %p0), metadata={op_name="jit(infer)/ECAPA_TDNN/Bottle2neck_0/Conv_8/conv_general_dilated"}
  ROOT %tuple.1 = (f32[64,512]{1,0}, bf16[64,750,512]{2,0,1}) tuple(%dot.1, %p1)
}

%fused_computation.13 (p0: f32[64,1536]) -> f32[64,1536] {
  %p0.1 = f32[64,1536]{1,0} parameter(0)
  ROOT %divide.1 = f32[64,1536]{1,0} divide(%p0.1, %p0.1), metadata={op_name="jit(infer)/ECAPA_TDNN/context_attention/div" source_file="/repo/models/ecapa.py"}
}

ENTRY %main.1 (arg0: f32[64,1024,160]) -> f32[64,2] {
  %arg0 = f32[64,1024,160]{2,1,0} parameter(0)
  %infer.1 = f32[64,768,20]{2,1,0} custom-call(%arg0), custom_call_target="tpu_custom_call", metadata={op_name="jit(infer)/pallas_call" source_file="/repo/ops/lfcc_pallas.py"}
  %convert_reduce_fusion.3 = (f32[64,512]{1,0:T(8,128)S(1)}, bf16[64,750,512]{2,0,1:T(8,128)(2,1)}) fusion(%arg0, %arg0), kind=kOutput, calls=%fused_computation.29, metadata={op_name="jit(infer)/ECAPA_TDNN/Bottle2neck_0/Conv_8/conv_general_dilated"}
  %fusion.8 = f32[64,1536]{1,0:T(8,128)S(1)} fusion(%arg0), kind=kOutput, calls=%fused_computation.13, metadata={op_name="jit(infer)/ECAPA_TDNN/context_attention/div" source_file="/repo/models/ecapa.py"}
  %fusion.2 = f32[48000,20]{1,0:T(8,128)S(1)} fusion(%arg0), kind=kCustom, metadata={op_name="jit(infer)/vmap()/gather" source_file="/repo/ops/dsp.py"}
  ROOT %dot.9 = f32[64,2]{1,0} dot(%arg0, %arg0), metadata={op_name="jit(infer)/ECAPA_TDNN/Dense_0/dot_general"}
}
"""


def test_parse_handles_tuple_types_and_custom_calls():
    stages = tr._parse_hlo_metadata(HLO)
    # tuple-typed fusion: classified through its called computation's dot
    assert stages["convert_reduce_fusion.3"] == "res2_1x1_convs_x6"
    # Pallas front-end custom-call: classified via source_file
    assert stages["infer.1"] == "lfcc_frontend"
    # delta gather from ops/dsp.py: front-end
    assert stages["fusion.2"] == "lfcc_frontend"
    # named_scope marker carries through the fused computation
    assert stages["fusion.8"] == "attention_and_pooling"
    assert stages["dot.9"] == "head_fc"


def test_event_names_reduce_to_instruction_names():
    full = ("%convert_reduce_fusion.3 = (f32[64,512]{1,0:T(8,128)S(1)}, "
            "bf16[64,750,512]{2,0,1:T(8,128)(2,1)}) fusion(%concatenate.8, "
            "%copy-done.6), kind=kOutput")
    assert tr._event_instr_name(full) == "convert_reduce_fusion.3"
    assert tr._event_instr_name("fusion.8") == "fusion.8"
    assert tr._event_instr_name("%dot.9 = f32[64,2]{1,0} dot(%a, %b)") \
        == "dot.9"


def test_classifier_stage_routing():
    c = tr.classify
    assert c("jit(infer)/ECAPA_TDNN/Bottle2neck_1/Conv_0/conv") \
        == "res2_1x1_convs_x6"
    assert c("jit(infer)/ECAPA_TDNN/Bottle2neck_1/Conv_8/conv") \
        == "res2_1x1_convs_x6"
    assert c("jit(infer)/ECAPA_TDNN/Bottle2neck_1/Conv_3/conv") \
        == "res2_64wide_chain_x3"
    assert c("jit(infer)/ECAPA_TDNN/Bottle2neck_0/SEModule1D_0/Dense_0/dot") \
        == "se_module_x3"
    assert c("jit(infer)/ECAPA_TDNN/mfa/add") == "mfa_3x_512_1536"
    assert c("jit(infer)/ECAPA_TDNN/attentive_stats/mul") \
        == "attention_and_pooling"
    assert c("jit(infer)/ECAPA_TDNN/Conv_0/conv") == "stem_conv_k5_60_512"
    assert c("jit(infer)/pallas_call @lfcc_pallas.py") == "lfcc_frontend"
    assert c("jit(infer)/vmap()/gather @dsp.py") == "lfcc_frontend"
    assert c("jit(infer)/broadcast") == "other"
