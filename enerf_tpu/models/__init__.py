from enerf_tpu.models.field import FieldStatic, init_field_params, field_forward, field_density, field_color, field_background
