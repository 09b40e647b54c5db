from boxlcd_tpu.render.raster import lcd_render, rgb_render

__all__ = ['lcd_render', 'rgb_render']
