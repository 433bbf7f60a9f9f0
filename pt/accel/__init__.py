"""Ray/scene intersection: brute-force reference path and LBVH build +
traversal. TPU-native replacement for the reference's Vulkan acceleration
structures (Renderer/AccelerationStructure.{h,cpp}) and the hardware
traceRaysKHR dispatch."""

from pt.accel.intersect import Hit, intersect_brute, occluded_brute
