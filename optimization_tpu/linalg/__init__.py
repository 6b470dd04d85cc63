from .stpcg import STPCGResult, stpcg
from .lobpcg import LOBPCGResult, lobpcg, rayleigh_ritz
from .lsqr import LSQRResult, lsqr
