from . import gcv, io, pdf  # noqa: F401
from .pages import page_url, render_page_html, synth_pages  # noqa: F401
