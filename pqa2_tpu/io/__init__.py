from pqa2_tpu.io.y4m import Y4MReader, Y4MWriter, read_y4m, write_y4m
from pqa2_tpu.io.video import VideoReader, open_video, probe_video
from pqa2_tpu.io.ffmpeg_pipe import FFmpegPipeReader

__all__ = [
    "Y4MReader",
    "Y4MWriter",
    "read_y4m",
    "write_y4m",
    "VideoReader",
    "open_video",
    "probe_video",
    "FFmpegPipeReader",
]
