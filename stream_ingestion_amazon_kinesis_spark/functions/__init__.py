from .numeric import dec, money, as_double  # noqa: F401
from .text import tokens, distinct_tokens  # noqa: F401
from .vectors import dot, norm, cosine  # noqa: F401
