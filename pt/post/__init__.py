"""Post-processing stack: exposure resolve, physically-based bloom pyramid,
tone mapping, sRGB/HDR10 encode. Counterpart of the reference's compute
shaders postprocess/bloomDownsample/bloomUpsample/composition/toneMapping/
uiComposition (.comp)."""

from pt.post.pipeline import (PostProcessSettings, compose_ui,
                              resolve_accumulation, bloom_pyramid,
                              tonemap_sdr, postprocess)
