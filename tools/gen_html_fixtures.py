#!/usr/bin/env python3
"""Generate the committed HTML fixtures for x_html_extract /
docs_html_funnel (fixtures/html/doc_*.html).

Deterministic, handwritten content — each doc exercises one extraction
behavior (script/style stripping, comments, link-density boilerplate,
entity decoding, exact/near dup after normalization, contamination
5-grams, empty docs, mixed-case and malformed tags). Doc 0 is the
funnel's probe/eval doc (doc_id % 97 == 0).

Run from the repo root: python3 tools/gen_html_fixtures.py
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "html")

# ~120-word article body reused by the dup family (docs 1/3/4). Plenty of
# stopwords and light punctuation so the funnel's quality gate passes.
ARTICLE = (
    "The committee published the annual report on the state of the river "
    "and the wetlands that surround it. The authors argue that the water "
    "level is falling faster than the models predicted and that the basin "
    "will need a decade of careful management. The report is based on the "
    "data that the field teams collected over the last three years with "
    "support from the regional office. The main finding is that the flow "
    "of the river depends on the winter snowpack and that the snowpack is "
    "shrinking. The committee recommends that the agencies share the cost "
    "of the monitoring stations and that the towns along the river adopt "
    "the new conservation rules before the next dry season arrives."
)

DOCS = {
    # probe/eval doc: shares the 5-gram "the quick brown fox jumps" with
    # doc 9 (contamination) and nothing else with the corpus
    0: """<html><body>
<p>Evaluation benchmark passage: the quick brown fox jumps over the lazy
dog while the judges watch from the old wooden bridge and take notes on
the form of the jump and the speed of the fox.</p>
</body></html>""",

    # the canonical article: script + style + comment stripping
    1: f"""<html><head>
<title>River Report</title>
<style type="text/css">body {{ margin: 0; color: #222; }}</style>
<script>var tracker = init("analytics"); tracker.send(1);</script>
</head><body>
<!-- layout header starts -->
<div class="header"><h1>River Report</h1></div>
<p>{ARTICLE}</p>
<script type="text/javascript">console.log("footer scripts");</script>
</body></html>""",

    # nav boilerplate: link-dense blocks dropped, one short content block
    2: """<html><body>
<nav><a href="/">Home</a> <a href="/news">News</a> <a href="/about">About</a>
<a href="/contact">Contact</a> <a href="/login">Login</a></nav>
<p>Only this sentence is the real content of the page today.</p>
<div class="footer"><a href="/terms">Terms</a> <a href="/privacy">Privacy</a>
<a href="/cookies">Cookies</a></div>
</body></html>""",

    # same TEXT as doc 1, different markup -> exact dup after extraction
    3: f"""<html><body>
<section   id="main">
<div><h2>River   Report</h2></div>
<div class="art">{ARTICLE}</div>
</section>
</body></html>""",

    # near dup of doc 1: two words changed -> LSH candidate, not exact
    4: "<html><body><h1>River Report</h1><p>"
       + ARTICLE.replace("careful management", "patient stewardship")
       + "</p></body></html>",

    # entity decoding
    5: """<html><body>
<p>Tom &amp; Jerry said &quot;the code uses a &lt;div&gt; tag&quot; and
that it isn&#39;t&nbsp;wrong because the parser keeps the text of the
page and the markup of the page apart from each other.</p>
</body></html>""",

    # br-separated lines and list items
    6: """<html><body>
<p>The first line of the poem<br>the second line of the poem<br/>
the third line of the poem</p>
<ul><li>the red item of the list</li><li>the blue item of the list</li>
<li>ok</li></ul>
</body></html>""",

    # table layout
    7: """<html><body><table>
<tr><td>The north field holds the old barn and the well.</td></tr>
<tr><td>The south field holds the new barn and the pump.</td></tr>
</table></body></html>""",

    # script-only page -> zero text blocks
    8: """<html><head><script>
window.onload = function () { render("app"); };
</script></head><body></body></html>""",

    # contaminated: contains the probe doc's 5-gram
    9: """<html><body>
<p>The training story begins when the quick brown fox jumps over the
fence of the farm and the farmer writes a long letter to the village
about the fox and the fence and the cost of the repairs that the fence
will need before the winter arrives with the first snow.</p>
</body></html>""",

    # low quality: short, punctuation-heavy
    10: """<html><body><p>!!! ??? ... ,,, ;;; buy now !!! ??? ...</p>
</body></html>""",

    # mixed-case tags
    11: """<HTML><BODY>
<P>The upper case markup of the page should not change the text that the
reader sees because the tags of the page are case insensitive.</P>
<SCRIPT>var x = 1;</SCRIPT>
</BODY></HTML>""",

    # malformed: unclosed tags, stray angle bracket as text
    12: """<html><body>
<p>The parser keeps going when the markup breaks: 2 < 3 is a fact of
math and the page still renders the text of the paragraph.
<div>The unclosed div above does not stop the block from ending here.
</body></html>""",

    # Spanish article (declared lang 'es' in the funnel query); > 100
    # words so the length term alone clears the quality gate (the
    # stopword list is English — a short Spanish doc scores ~0.42 and
    # dies before the lang gate is ever tested)
    13: """<html><body>
<p>El informe anual describe el estado del agua y de la cuenca para que
la gente del valle pueda ver los datos con calma y para que los pueblos
de la zona puedan preparar con tiempo las obras que el cauce necesita
antes de la temporada seca que viene cada verano con menos lluvia. Los
equipos de campo midieron el caudal del cauce durante tres inviernos y
el resultado indica que la nieve de la sierra baja cada vez antes y que
el agua del deshielo llega con menos fuerza a los embalses del valle.
El consejo pide que las aldeas de la ribera compartan el coste de las
estaciones de medida y que los cultivos de la vega adopten las normas
nuevas de riego antes de que la sequia del proximo verano obligue a
cerrar las acequias que riegan los campos de la comarca.</p>
</body></html>""",

    # link-density boundary: 3 of 6 words linked (300 <= 300, kept) and a
    # 2-of-3 linked block (200 > 150, dropped)
    14: """<html><body>
<p>Visit <a href="/shop">our great shop</a> today folks</p>
<p>See <a href="/x">more stuff</a></p>
<p>The closing block of the page carries the rest of the words that the
reader came to find and the page ends here.</p>
</body></html>""",

    # inline tags inside words and anchors inside a long paragraph
    15: """<html><body>
<p>The editor marked the word as <em>important</em> and linked
<a href="/ref">the source of the claim</a> so that the reader of the
page can check the claim against the record and form a view of the
matter with the facts in hand.</p>
</body></html>""",
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for i, html in DOCS.items():
        with open(os.path.join(OUT, f"doc_{i}.html"), "w") as f:
            f.write(html)
    print(f"wrote {len(DOCS)} fixtures to {OUT}")


if __name__ == "__main__":
    main()
