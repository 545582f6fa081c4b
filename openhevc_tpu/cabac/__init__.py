from .engine import CabacDecoder, CabacEncoder
from .contexts import ContextSet, CTX_OFFSET, NUM_CONTEXTS
