from frontistr_tpu.elements.tables import (  # noqa: F401
    ETYPE_INFO,
    ElementTable,
    get_table,
    shape_func,
    shape_deriv,
)
