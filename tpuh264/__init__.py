"""tpu-h264: a TPU-native H.264/AVC encode/decode engine built from scratch.

Capabilities mirror the reference real-time codec lab
(divyanshu-kumar/openh264-wasm, see SURVEY.md): encoder sessions with
RTC presets + forced keyframes (reference: openh264_wrapper.cpp:198-236),
a pool of independent decoder streams (openh264_wrapper.cpp:240-280),
RGBA<->YUV420 conversion kernels (openh264_wrapper.cpp:22-195,
wgsl_shaders.js:101-165), a 1-encoder -> N-decoder fan-out pipeline with
bounded-buffer backpressure (encoder_worker.js:163-202), live per-stage
metrics (app.js:694-721) and an automated benchmark matrix
(automation.js:70-158) -- plus the codec interior itself (intra
prediction, integer transforms, quantization, CAVLC), which the
reference outsources to libopenh264.a.

Layering (SURVEY.md section 7):
  core/        frame & bitstream substrate (NAL, Exp-Golomb, SPS/PPS/slice)
  kernels/     JAX/Pallas pixel-domain kernels (color, transform, intra)
  entropy/     CAVLC symbolization (TPU) + bit packing (C++/Python)
  engine/      encoder/decoder sessions, frame ring, pipeline runtime
  dist/        device-mesh sharding of streams/GOPs
  bench/       benchmark matrix harness
  conformance/ external-decoder (libavcodec) conformance checks
  golden/      numpy reference model (test oracle)
"""

__version__ = "0.1.0"
