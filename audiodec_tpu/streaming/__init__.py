from audiodec_tpu.streaming.engine import StreamingCodec
from audiodec_tpu.streaming.streamer import DeviceStreamer, SimulatedStreamer
