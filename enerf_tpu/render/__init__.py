from enerf_tpu.render.renderer import render_rays, render_rays_staged, sample_pdf
