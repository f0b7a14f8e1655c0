"""Build the browsable HTML docs site from the markdown sources.

The reference commits a rendered Sphinx HTML site (/root/reference/docs/
-- built pages plus docs/_sources/*.rst.txt).  This image has no
sphinx/mkdocs, so the site builds with a small dependency-free markdown
renderer covering exactly the constructs the docs use: ATX headings,
fenced code blocks, tables, lists, links, inline code, bold/italics and
horizontal rules.  Output: docs/_build/<page>.html with a shared nav.

Usage: python docs/build.py [out_dir]
Tested by tests/test_docs.py (build + API-signature sync check).
"""

from __future__ import annotations

import html
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
PAGES = ["index", "setup", "architecture", "api_reference", "api"]

CSS = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       max-width: 60rem; margin: 0 auto; padding: 1rem 2rem;
       color: #1a1a1a; line-height: 1.55; }
nav { border-bottom: 1px solid #ddd; padding-bottom: .5rem;
      margin-bottom: 1.5rem; }
nav a { margin-right: 1.2rem; text-decoration: none; color: #0b5394; }
code { background: #f4f4f4; padding: .1em .3em; border-radius: 3px;
       font-size: .92em; }
pre { background: #f7f7f7; border: 1px solid #e3e3e3; border-radius: 5px;
      padding: .8rem 1rem; overflow-x: auto; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 1rem 0; }
th, td { border: 1px solid #ccc; padding: .35rem .6rem;
         text-align: left; vertical-align: top; }
th { background: #f0f0f0; }
h1, h2, h3, h4 { line-height: 1.25; }
h2 { border-bottom: 1px solid #eee; padding-bottom: .2rem; }
blockquote { border-left: 3px solid #ccc; margin-left: 0;
             padding-left: 1rem; color: #555; }
"""


def _slug(text: str) -> str:
    """GitHub-style anchor slug (the docs cross-link with #anchors)."""
    text = re.sub(r"[`*]", "", text.strip().lower())
    text = re.sub(r"[^\w\- ]", "", text)
    return text.replace(" ", "-")


def _inline(text: str) -> str:
    """Inline markdown -> HTML (code spans first; they win over emphasis)."""
    out, pos = [], 0
    for m in re.finditer(r"`([^`]+)`", text):
        out.append(_emphasis(html.escape(text[pos:m.start()])))
        out.append(f"<code>{html.escape(m.group(1))}</code>")
        pos = m.end()
    out.append(_emphasis(html.escape(text[pos:])))
    return "".join(out)


def _emphasis(esc: str) -> str:
    esc = re.sub(r"\[([^\]]+)\]\(([^)]+)\)",
                 lambda m: f'<a href="{m.group(2)}">{m.group(1)}</a>', esc)
    esc = re.sub(r"\*\*([^*]+)\*\*", r"<b>\1</b>", esc)
    esc = re.sub(r"(?<![\w*])\*([^*]+)\*(?![\w*])", r"<i>\1</i>", esc)
    return esc


def render(md: str) -> str:
    """Markdown body -> HTML body."""
    lines = md.splitlines()
    out: list[str] = []
    i = 0
    in_list = False

    def close_list():
        nonlocal in_list
        if in_list:
            out.append("</ul>")
            in_list = False

    while i < len(lines):
        ln = lines[i]
        if ln.startswith("```"):
            close_list()
            i += 1
            block = []
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i])
                i += 1
            i += 1
            out.append("<pre><code>"
                       + html.escape("\n".join(block)) + "</code></pre>")
            continue
        m = re.match(r"^(#{1,6}) (.*)$", ln)
        if m:
            close_list()
            level = len(m.group(1))
            text = m.group(2)
            out.append(
                f'<h{level} id="{_slug(text)}">{_inline(text)}</h{level}>'
            )
            i += 1
            continue
        if re.match(r"^(-{3,}|\*{3,})\s*$", ln):
            close_list()
            out.append("<hr/>")
            i += 1
            continue
        if ln.startswith("|"):
            close_list()
            rows = []
            while i < len(lines) and lines[i].startswith("|"):
                rows.append(
                    [c.strip() for c in lines[i].strip().strip("|").split("|")]
                )
                i += 1
            body = []
            header = rows[0]
            data = [r for r in rows[1:]
                    if not all(re.match(r"^:?-+:?$", c) for c in r if c)]
            body.append("<table><tr>"
                        + "".join(f"<th>{_inline(c)}</th>" for c in header)
                        + "</tr>")
            for r in data:
                body.append("<tr>"
                            + "".join(f"<td>{_inline(c)}</td>" for c in r)
                            + "</tr>")
            body.append("</table>")
            out.append("".join(body))
            continue
        m = re.match(r"^[-*] (.*)$", ln)
        if m:
            if not in_list:
                out.append("<ul>")
                in_list = True
            item = [m.group(1)]
            i += 1
            while i < len(lines) and re.match(r"^\s{2,}\S", lines[i]):
                item.append(lines[i].strip())
                i += 1
            out.append(f"<li>{_inline(' '.join(item))}</li>")
            continue
        if ln.startswith("> "):
            close_list()
            quote = []
            while i < len(lines) and lines[i].startswith(">"):
                quote.append(lines[i].lstrip("> "))
                i += 1
            out.append(f"<blockquote>{_inline(' '.join(quote))}</blockquote>")
            continue
        if not ln.strip():
            close_list()
            i += 1
            continue
        # paragraph: join until a blank / structural line
        para = [ln]
        i += 1
        while i < len(lines) and lines[i].strip() and not re.match(
            r"^(#|```|\||[-*] |> |(-{3,}|\*{3,})\s*$)", lines[i]
        ):
            para.append(lines[i])
            i += 1
        out.append(f"<p>{_inline(' '.join(para))}</p>")
    close_list()
    return "\n".join(out)


def build(out_dir: str | None = None) -> list[str]:
    out_dir = out_dir or os.path.join(HERE, "_build")
    os.makedirs(out_dir, exist_ok=True)
    nav = "<nav>" + "".join(
        f'<a href="{p}.html">{p.replace("_", " ")}</a>' for p in PAGES
    ) + "</nav>"
    written = []
    for page in PAGES:
        src = os.path.join(HERE, page + ".md")
        if not os.path.exists(src):
            continue
        with open(src) as f:
            body = render(f.read())
        doc = (
            "<!doctype html><html><head><meta charset='utf-8'>"
            f"<title>alifmm_tpu -- {page}</title>"
            f"<style>{CSS}</style></head><body>{nav}{body}</body></html>"
        )
        dst = os.path.join(out_dir, page + ".html")
        with open(dst, "w") as f:
            f.write(doc)
        written.append(dst)
    return written


if __name__ == "__main__":
    for p in build(sys.argv[1] if len(sys.argv) > 1 else None):
        print(p)
