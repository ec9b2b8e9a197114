from .expressions import ParsedFunction, compile_expression, parse_constants
from .prm import Params, parse_prm, dump_prm
from .timer import TimerOutput
from .report import ConvergenceTable, append_results_csv
from .vtu import (write_vtu, write_vtu_background, write_vtu_immersed,
                  export_matrix_csv)

__all__ = [
    "ParsedFunction", "compile_expression", "parse_constants", "Params",
    "parse_prm", "dump_prm", "TimerOutput", "ConvergenceTable",
    "append_results_csv", "write_vtu", "write_vtu_background",
    "write_vtu_immersed", "export_matrix_csv",
]
