from .stpcg import STPCGResult, stpcg
