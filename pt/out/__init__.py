"""Offline output: image files and video encoding.
Counterpart of the reference's OutputSaver (Renderer/OutputSaver.{h,cpp})."""

from pt.out.saver import OutputInfo, OutputSaver, write_image
