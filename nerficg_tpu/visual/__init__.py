from nerficg_tpu.visual.colormaps import ColorMap, apply_color_map
