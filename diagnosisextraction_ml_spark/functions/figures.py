"""Figure rendering — the reference's matplotlib/seaborn plots, stdlib+numpy only.

The reference renders ROC / precision-recall curves, confusion-matrix
heatmaps, and swarm plots with matplotlib+seaborn (`plotSTD`/`plotROC`
at /root/reference/src/NLP_functions.py:680-750, `plotPrecisionRecall`
at /root/reference/src/TextClassification.py:551-581,
`plot_confusion_matrix` at :892-949, `plotSwarm` at :986-1019). This
container has neither library, so this module is a tiny deterministic
rasterizer over the repo's own from-spec PNG encoder
(:mod:`..functions.png`): pixel lines, alpha fills, a stroke font, data
axes — enough to render every figure family the reference produces.

Scale notes: rendering is strictly a DRIVER-SIDE endpoint. Every input
is an already-reduced artifact of the distributed ops — ≤100-point
interpolated curve grids (`harness.roc_grid`), a 2×2 count matrix
(`evaluate.confusion_counts`), or a hash-downsampled ≤2k point cloud
(`evaluate.swarm_points`). No DataFrame enters this module; nothing
here runs on executors.

Everything is deterministic (no RNG): swarm jitter is md5-derived, so
the same inputs render byte-identical PNGs on any machine.
"""

from __future__ import annotations

import hashlib

import numpy as np

from diagnosisextraction_ml_spark.functions.png import encode_png

# Validated categorical palette (colorblind-safe adjacent pairs, fixed
# slot order — never cycled) + neutral inks for text/axes/grid.
PALETTE = (
    "#2a78d6",  # blue
    "#eb6834",  # orange
    "#1baf7a",  # aqua
    "#eda100",  # yellow
    "#e87ba4",  # magenta
    "#008300",  # green
    "#4a3aa7",  # violet
    "#e34948",  # red
)
_INK = (26, 26, 25)  # primary text
_INK_MUTED = (110, 110, 105)  # secondary text / axis lines
_GRID = (231, 231, 228)  # gridlines
_BG = (255, 255, 255)


def _rgb(color) -> tuple[int, int, int]:
    if isinstance(color, str):
        c = color.lstrip("#")
        return int(c[0:2], 16), int(c[2:4], 16), int(c[4:6], 16)
    return tuple(int(v) for v in color)


# ---------------------------------------------------------------------------
# Stroke font: each glyph is a list of line segments on a 5x7 grid
# (x 0..4 left→right, y 0..6 top→bottom). Lowercase maps to uppercase.
# ---------------------------------------------------------------------------
_GLYPHS: dict[str, list[tuple[float, float, float, float]]] = {
    " ": [],
    "A": [(0, 6, 0, 2), (0, 2, 2, 0), (2, 0, 4, 2), (4, 2, 4, 6), (0, 4, 4, 4)],
    "B": [(0, 0, 0, 6), (0, 0, 3, 0), (3, 0, 4, 1), (4, 1, 4, 2), (4, 2, 3, 3),
          (0, 3, 3, 3), (3, 3, 4, 4), (4, 4, 4, 5), (4, 5, 3, 6), (0, 6, 3, 6)],
    "C": [(4, 1, 3, 0), (3, 0, 1, 0), (1, 0, 0, 1), (0, 1, 0, 5), (0, 5, 1, 6),
          (1, 6, 3, 6), (3, 6, 4, 5)],
    "D": [(0, 0, 0, 6), (0, 0, 3, 0), (3, 0, 4, 1), (4, 1, 4, 5), (4, 5, 3, 6),
          (3, 6, 0, 6)],
    "E": [(4, 0, 0, 0), (0, 0, 0, 6), (0, 6, 4, 6), (0, 3, 3, 3)],
    "F": [(4, 0, 0, 0), (0, 0, 0, 6), (0, 3, 3, 3)],
    "G": [(4, 1, 3, 0), (3, 0, 1, 0), (1, 0, 0, 1), (0, 1, 0, 5), (0, 5, 1, 6),
          (1, 6, 3, 6), (3, 6, 4, 5), (4, 5, 4, 3), (4, 3, 2, 3)],
    "H": [(0, 0, 0, 6), (4, 0, 4, 6), (0, 3, 4, 3)],
    "I": [(1, 0, 3, 0), (2, 0, 2, 6), (1, 6, 3, 6)],
    "J": [(4, 0, 4, 5), (4, 5, 3, 6), (3, 6, 1, 6), (1, 6, 0, 5)],
    "K": [(0, 0, 0, 6), (4, 0, 0, 3), (0, 3, 4, 6)],
    "L": [(0, 0, 0, 6), (0, 6, 4, 6)],
    "M": [(0, 6, 0, 0), (0, 0, 2, 3), (2, 3, 4, 0), (4, 0, 4, 6)],
    "N": [(0, 6, 0, 0), (0, 0, 4, 6), (4, 6, 4, 0)],
    "O": [(1, 0, 3, 0), (3, 0, 4, 1), (4, 1, 4, 5), (4, 5, 3, 6), (3, 6, 1, 6),
          (1, 6, 0, 5), (0, 5, 0, 1), (0, 1, 1, 0)],
    "P": [(0, 6, 0, 0), (0, 0, 3, 0), (3, 0, 4, 1), (4, 1, 4, 2), (4, 2, 3, 3),
          (3, 3, 0, 3)],
    "Q": [(1, 0, 3, 0), (3, 0, 4, 1), (4, 1, 4, 5), (4, 5, 3, 6), (3, 6, 1, 6),
          (1, 6, 0, 5), (0, 5, 0, 1), (0, 1, 1, 0), (2, 4, 4, 6)],
    "R": [(0, 6, 0, 0), (0, 0, 3, 0), (3, 0, 4, 1), (4, 1, 4, 2), (4, 2, 3, 3),
          (3, 3, 0, 3), (1, 3, 4, 6)],
    "S": [(4, 1, 3, 0), (3, 0, 1, 0), (1, 0, 0, 1), (0, 1, 0, 2), (0, 2, 1, 3),
          (1, 3, 3, 3), (3, 3, 4, 4), (4, 4, 4, 5), (4, 5, 3, 6), (3, 6, 1, 6),
          (1, 6, 0, 5)],
    "T": [(0, 0, 4, 0), (2, 0, 2, 6)],
    "U": [(0, 0, 0, 5), (0, 5, 1, 6), (1, 6, 3, 6), (3, 6, 4, 5), (4, 5, 4, 0)],
    "V": [(0, 0, 2, 6), (2, 6, 4, 0)],
    "W": [(0, 0, 1, 6), (1, 6, 2, 3), (2, 3, 3, 6), (3, 6, 4, 0)],
    "X": [(0, 0, 4, 6), (4, 0, 0, 6)],
    "Y": [(0, 0, 2, 3), (4, 0, 2, 3), (2, 3, 2, 6)],
    "Z": [(0, 0, 4, 0), (4, 0, 0, 6), (0, 6, 4, 6)],
    "0": [(1, 0, 3, 0), (3, 0, 4, 1), (4, 1, 4, 5), (4, 5, 3, 6), (3, 6, 1, 6),
          (1, 6, 0, 5), (0, 5, 0, 1), (0, 1, 1, 0), (1, 5, 3, 1)],
    "1": [(1, 1, 2, 0), (2, 0, 2, 6), (1, 6, 3, 6)],
    "2": [(0, 1, 1, 0), (1, 0, 3, 0), (3, 0, 4, 1), (4, 1, 4, 2), (4, 2, 0, 6),
          (0, 6, 4, 6)],
    "3": [(0, 0, 4, 0), (4, 0, 2, 2), (2, 2, 4, 4), (4, 4, 4, 5), (4, 5, 3, 6),
          (1, 6, 3, 6), (1, 6, 0, 5)],
    "4": [(3, 0, 0, 4), (0, 4, 4, 4), (3, 0, 3, 6)],
    "5": [(4, 0, 0, 0), (0, 0, 0, 3), (0, 3, 3, 3), (3, 3, 4, 4), (4, 4, 4, 5),
          (4, 5, 3, 6), (3, 6, 1, 6), (1, 6, 0, 5)],
    "6": [(3, 0, 1, 0), (1, 0, 0, 1), (0, 1, 0, 5), (0, 5, 1, 6), (1, 6, 3, 6),
          (3, 6, 4, 5), (4, 5, 4, 4), (4, 4, 3, 3), (3, 3, 0, 3)],
    "7": [(0, 0, 4, 0), (4, 0, 1, 6)],
    "8": [(1, 0, 3, 0), (3, 0, 4, 1), (4, 1, 4, 2), (4, 2, 3, 3), (3, 3, 1, 3),
          (1, 3, 0, 2), (0, 2, 0, 1), (0, 1, 1, 0), (1, 3, 0, 4), (0, 4, 0, 5),
          (0, 5, 1, 6), (1, 6, 3, 6), (3, 6, 4, 5), (4, 5, 4, 4), (4, 4, 3, 3)],
    "9": [(4, 3, 1, 3), (1, 3, 0, 2), (0, 2, 0, 1), (0, 1, 1, 0), (1, 0, 3, 0),
          (3, 0, 4, 1), (4, 1, 4, 5), (4, 5, 3, 6), (3, 6, 1, 6)],
    ".": [(2, 6, 2, 6)],
    ",": [(2, 5, 2, 6), (2, 6, 1, 7)],
    "-": [(1, 3, 3, 3)],
    "+": [(2, 1, 2, 5), (0, 3, 4, 3)],
    "=": [(0, 2, 4, 2), (0, 4, 4, 4)],
    "/": [(0, 6, 4, 0)],
    "(": [(3, 0, 2, 1), (2, 1, 2, 5), (2, 5, 3, 6)],
    ")": [(1, 0, 2, 1), (2, 1, 2, 5), (2, 5, 1, 6)],
    ":": [(2, 2, 2, 2), (2, 5, 2, 5)],
    "%": [(0, 6, 4, 0), (0, 0, 1, 0), (1, 0, 1, 1), (1, 1, 0, 1), (0, 1, 0, 0),
          (3, 5, 4, 5), (4, 5, 4, 6), (4, 6, 3, 6), (3, 6, 3, 5)],
    "_": [(0, 6, 4, 6)],
}
_CHAR_ADVANCE = 6.0  # grid units incl. inter-char gap


def text_width(s: str, scale: float = 2.0) -> int:
    """Pixel width of ``s`` at the given scale."""
    return int(len(s) * _CHAR_ADVANCE * scale)


class Canvas:
    """uint8 RGB pixel canvas with lines, discs, fills, and stroke text."""

    def __init__(self, width: int = 640, height: int = 480, bg=_BG):
        self.w, self.h = int(width), int(height)
        self.img = np.full((self.h, self.w, 3), _rgb(bg), dtype=np.uint8)

    # -- primitives --------------------------------------------------------
    def blend_mask(self, mask: np.ndarray, color, alpha: float = 1.0) -> None:
        c = np.array(_rgb(color), dtype=np.float64)
        if alpha >= 1.0:
            self.img[mask] = c.astype(np.uint8)
        else:
            px = self.img[mask].astype(np.float64)
            self.img[mask] = (px * (1 - alpha) + c * alpha).round().astype(np.uint8)

    def disc(self, x: float, y: float, r: float, color, alpha: float = 1.0) -> None:
        x0, x1 = max(0, int(x - r - 1)), min(self.w, int(x + r + 2))
        y0, y1 = max(0, int(y - r - 1)), min(self.h, int(y + r + 2))
        if x0 >= x1 or y0 >= y1:
            return
        yy, xx = np.mgrid[y0:y1, x0:x1]
        sub = (xx - x) ** 2 + (yy - y) ** 2 <= r * r
        mask = np.zeros((self.h, self.w), dtype=bool)
        mask[y0:y1, x0:x1] = sub
        self.blend_mask(mask, color, alpha)

    def line(self, x0, y0, x1, y1, color, width: float = 2.0, alpha: float = 1.0) -> None:
        """Pixel-space segment, drawn as a dense run of squares (cheap,
        exact, no AA — canvases are small and driver-side)."""
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        ts = np.linspace(0.0, 1.0, n + 1)
        xs = np.round(x0 + (x1 - x0) * ts).astype(int)
        ys = np.round(y0 + (y1 - y0) * ts).astype(int)
        half = max(0, int(round(width / 2)) - 0) if width > 1 else 0
        mask = np.zeros((self.h, self.w), dtype=bool)
        for dx in range(-half, half + 1):
            for dy in range(-half, half + 1):
                px = np.clip(xs + dx, 0, self.w - 1)
                py = np.clip(ys + dy, 0, self.h - 1)
                mask[py, px] = True
        self.blend_mask(mask, color, alpha)

    def rect(self, x0, y0, x1, y1, color, alpha: float = 1.0) -> None:
        xa, xb = sorted((int(round(x0)), int(round(x1))))
        ya, yb = sorted((int(round(y0)), int(round(y1))))
        xa, xb = max(0, xa), min(self.w, xb)
        ya, yb = max(0, ya), min(self.h, yb)
        if xa >= xb or ya >= yb:
            return
        mask = np.zeros((self.h, self.w), dtype=bool)
        mask[ya:yb, xa:xb] = True
        self.blend_mask(mask, color, alpha)

    def text(self, x, y, s, color=_INK, scale: float = 2.0, anchor: str = "lt", rot: int = 0) -> None:
        """Stroke-font text. ``anchor``: `[lcr][tmb]` — horizontal then
        vertical alignment of (x, y) relative to the string's box.
        ``rot=90`` renders top-to-bottom (vertical tick labels)."""
        s = str(s).upper()
        wpx = text_width(s, scale)
        hpx = 7 * scale
        ha, va = anchor[0], anchor[1]
        lw = max(1.0, scale * 0.6)
        if rot == 90:
            # 90° CW: advance runs down the canvas, glyph tops face right.
            # Rotated box: width = glyph height (right edge at ox),
            # height = string length (top at oy).
            ox = x + (hpx / 2 if ha == "c" else hpx if ha == "l" else 0)
            oy = y - (wpx / 2 if va == "m" else wpx if va == "b" else 0)
            for i, ch in enumerate(s):
                segs = _GLYPHS.get(ch, _GLYPHS["-"])
                cy = oy + i * _CHAR_ADVANCE * scale
                for (ax, ay, bx, by) in segs:
                    self.line(
                        ox - ay * scale, cy + ax * scale,
                        ox - by * scale, cy + bx * scale,
                        color, width=lw,
                    )
            return
        ox = x - (wpx / 2 if ha == "c" else wpx if ha == "r" else 0)
        oy = y - (hpx / 2 if va == "m" else hpx if va == "b" else 0)
        for i, ch in enumerate(s):
            segs = _GLYPHS.get(ch, _GLYPHS["-"])
            cx = ox + i * _CHAR_ADVANCE * scale
            for (ax, ay, bx, by) in segs:
                self.line(
                    cx + ax * scale, oy + ay * scale,
                    cx + bx * scale, oy + by * scale,
                    color, width=lw,
                )

    def to_png(self) -> bytes:
        return encode_png(self.img)

    def save(self, path: str) -> bytes:
        data = self.to_png()
        with open(path, "wb") as f:
            f.write(data)
        return data


class Figure:
    """A single-axes data plot: limits, ticks, grid, legend, marks."""

    def __init__(
        self,
        width: int = 640,
        height: int = 480,
        xlim=(0.0, 1.0),
        ylim=(0.0, 1.0),
        title: str = "",
        xlabel: str = "",
        ylabel: str = "",
    ):
        self.canvas = Canvas(width, height)
        self.xlim, self.ylim = xlim, ylim
        # margins: left room for y ticks, bottom for x ticks + label,
        # top for title + horizontal y-label (no rotated text needed)
        self.ml, self.mr = 58, 16
        self.mt = 46 if (title or ylabel) else 18
        self.mb = 44 if xlabel else 30
        self.title, self.xlabel, self.ylabel = title, xlabel, ylabel
        self._legend: list[tuple[str, tuple[int, int, int]]] = []

    # -- data→pixel transforms --------------------------------------------
    def px(self, x: float) -> float:
        (a, b), w = self.xlim, self.canvas.w
        return self.ml + (x - a) / (b - a) * (w - self.ml - self.mr)

    def py(self, y: float) -> float:
        (a, b), h = self.ylim, self.canvas.h
        return (h - self.mb) - (y - a) / (b - a) * (h - self.mt - self.mb)

    # -- frame -------------------------------------------------------------
    def axes(self, xticks=None, yticks=None, tick_fmt="{:.1f}") -> None:
        c = self.canvas
        if xticks is None:
            xticks = np.linspace(self.xlim[0], self.xlim[1], 6)
        if yticks is None:
            yticks = np.linspace(self.ylim[0], self.ylim[1], 6)
        for tx in xticks:
            X = self.px(tx)
            c.line(X, self.py(self.ylim[0]), X, self.py(self.ylim[1]), _GRID, 1)
            c.text(X, c.h - self.mb + 6, tick_fmt.format(tx), _INK_MUTED, 1.5, "ct")
        for ty in yticks:
            Y = self.py(ty)
            c.line(self.px(self.xlim[0]), Y, self.px(self.xlim[1]), Y, _GRID, 1)
            c.text(self.ml - 6, Y, tick_fmt.format(ty), _INK_MUTED, 1.5, "rm")
        # axis spines (left + bottom only — recessive frame)
        c.line(self.ml, self.mt, self.ml, c.h - self.mb, _INK_MUTED, 1)
        c.line(self.ml, c.h - self.mb, c.w - self.mr, c.h - self.mb, _INK_MUTED, 1)
        if self.title:
            c.text(c.w / 2, 8, self.title, _INK, 2.0, "ct")
        if self.ylabel:  # horizontal, above the y axis
            c.text(self.ml, self.mt - 12, self.ylabel, _INK_MUTED, 1.5, "lb")
        if self.xlabel:
            c.text((self.ml + c.w - self.mr) / 2, c.h - 16, self.xlabel, _INK_MUTED, 1.5, "ct")

    # -- marks --------------------------------------------------------------
    def plot(self, xs, ys, color, width: float = 2.0, alpha: float = 1.0, label: str | None = None) -> None:
        xs, ys = np.asarray(xs, float), np.asarray(ys, float)
        for i in range(len(xs) - 1):
            self.canvas.line(
                self.px(xs[i]), self.py(ys[i]), self.px(xs[i + 1]), self.py(ys[i + 1]),
                color, width, alpha,
            )
        if label:
            self._legend.append((label, _rgb(color)))

    def fill_between(self, xs, lo, hi, color, alpha: float = 0.15) -> None:
        xs = np.asarray(xs, float)
        lo, hi = np.asarray(lo, float), np.asarray(hi, float)
        c = self.canvas
        x0, x1 = int(np.ceil(self.px(xs.min()))), int(np.floor(self.px(xs.max())))
        cols = np.arange(max(self.ml, x0), min(c.w - self.mr, x1) + 1)
        if len(cols) == 0:
            return
        # invert px() for the column grid, then interp the band bounds
        (a, b) = self.xlim
        data_x = a + (cols - self.ml) / (c.w - self.ml - self.mr) * (b - a)
        ylo = np.interp(data_x, xs, lo)
        yhi = np.interp(data_x, xs, hi)
        mask = np.zeros((c.h, c.w), dtype=bool)
        for cx, l, u in zip(cols, ylo, yhi):
            pa, pb = sorted((int(round(self.py(l))), int(round(self.py(u)))))
            pa, pb = max(self.mt, pa), min(c.h - self.mb, pb)
            if pa <= pb:
                mask[pa : pb + 1, cx] = True
        c.blend_mask(mask, color, alpha)

    def scatter(self, xs, ys, color, r: float = 2.5, alpha: float = 1.0, label: str | None = None) -> None:
        for x, y in zip(np.asarray(xs, float), np.asarray(ys, float)):
            self.canvas.disc(self.px(x), self.py(y), r, color, alpha)
        if label:
            self._legend.append((label, _rgb(color)))

    def bar(self, x: float, height: float, width: float, color, baseline: float = 0.0,
            alpha: float = 1.0, label: str | None = None) -> None:
        """Vertical bar centered on data-x, from ``baseline`` to ``height``."""
        x0, x1 = self.px(x - width / 2), self.px(x + width / 2)
        # 2px surface gap between adjacent fills
        self.canvas.rect(x0 + 1, self.py(baseline), x1 - 1, self.py(height), color, alpha)
        if label:
            self._legend.append((label, _rgb(color)))

    def errorbar(self, x: float, lo: float, hi: float, color=_INK, cap_px: float = 5.0) -> None:
        """Vertical error whisker with end caps (data coords)."""
        X = self.px(x)
        self.canvas.line(X, self.py(lo), X, self.py(hi), color, 1.5)
        for v in (lo, hi):
            self.canvas.line(X - cap_px, self.py(v), X + cap_px, self.py(v), color, 1.5)

    def legend(self, loc: str = "br") -> None:
        """Swatch + label box. ``loc``: `br` bottom-right (ROC) or `tr`."""
        if not self._legend:
            return
        c = self.canvas
        scale = 1.5
        wmax = max(text_width(lbl, scale) for lbl, _ in self._legend)
        row_h = int(7 * scale + 8)
        box_w, box_h = wmax + 36, row_h * len(self._legend) + 8
        if loc == "br":
            bx = c.w - self.mr - box_w - 8
            by = c.h - self.mb - box_h - 8
        else:
            bx = c.w - self.mr - box_w - 8
            by = self.mt + 8
        c.rect(bx, by, bx + box_w, by + box_h, _BG, 0.85)
        for i, (lbl, col) in enumerate(self._legend):
            cy = by + 8 + i * row_h + 7 * scale / 2
            c.line(bx + 6, cy, bx + 26, cy, col, 3)
            c.text(bx + 32, cy, lbl, _INK, scale, "lm")

    def save(self, path: str | None) -> bytes:
        if path:
            return self.canvas.save(path)
        return self.canvas.to_png()


# ---------------------------------------------------------------------------
# Reference-parity figure families
# ---------------------------------------------------------------------------

def plot_roc_std(models: dict, path: str | None = None, title: str = "ROC CURVE") -> bytes:
    """Mean ROC ± std band per model + chance diagonal.

    Ref: plotSTD/plotROC (/root/reference/src/NLP_functions.py:680-750)
    — mean TPR over folds on a common 100-pt FPR grid, ``fill_between``
    of ±std clipped to [0, 1], legend "NAME (AUC = m ± s)".

    ``models``: name → (grid, mean_tpr, std_tpr, mean_auc, std_auc) —
    exactly ``harness.roc_grid(name)`` + the summary stats.
    """
    fig = Figure(
        title=title, xlabel="FALSE POSITIVE RATE", ylabel="TRUE POSITIVE RATE"
    )
    fig.axes()
    fig.plot([0, 1], [0, 1], _INK_MUTED, width=1.5, alpha=0.8, label="CHANCE")
    for i, (name, (grid, mean_tpr, std_tpr, mean_auc, std_auc)) in enumerate(
        sorted(models.items())
    ):
        color = PALETTE[i % len(PALETTE)]
        grid = np.asarray(grid, float)
        mean_tpr = np.asarray(mean_tpr, float)
        std_tpr = np.asarray(std_tpr, float)
        fig.fill_between(
            grid, np.maximum(mean_tpr - std_tpr, 0), np.minimum(mean_tpr + std_tpr, 1),
            color, alpha=0.15,
        )
        fig.plot(
            grid, mean_tpr, color, width=2.5,
            label=f"{name} (AUC = {mean_auc:.2f} +/- {std_auc:.2f})",
        )
    fig.legend("br")
    return fig.save(path)


def plot_precision_recall(models: dict, path: str | None = None, title: str = "PRECISION-RECALL") -> bytes:
    """Mean precision over a common recall grid per model, ± std band.

    Ref: plotPrecisionRecall / plotPR
    (/root/reference/src/TextClassification.py:551-581,
    src/NLP_functions.py:716-745) — fold precisions interpolated onto
    ``linspace(0, 1, 100)`` recall, legend "NAME (AUPRC = m ± s)".

    ``models``: name → (recall_grid, mean_prec, std_prec, auprc_mean,
    auprc_std) — ``harness.pr_grid(name)`` + summary stats.
    """
    fig = Figure(title=title, xlabel="RECALL", ylabel="PRECISION")
    fig.axes()
    for i, (name, (grid, mean_p, std_p, auc_m, auc_s)) in enumerate(sorted(models.items())):
        color = PALETTE[i % len(PALETTE)]
        grid = np.asarray(grid, float)
        mean_p = np.asarray(mean_p, float)
        std_p = np.asarray(std_p, float)
        fig.fill_between(
            grid, np.maximum(mean_p - std_p, 0), np.minimum(mean_p + std_p, 1),
            color, alpha=0.15,
        )
        fig.plot(
            grid, mean_p, color, width=2.5,
            label=f"{name} (AUPRC = {auc_m:.2f} +/- {auc_s:.2f})",
        )
    fig.legend("br")
    return fig.save(path)


def plot_confusion_matrix(
    counts,
    path: str | None = None,
    class_names=("NEGATIVE", "POSITIVE"),
    title: str = "CONFUSION MATRIX",
) -> bytes:
    """2×2 heatmap with in-cell counts (sequential single-hue ramp).

    Ref: plot_confusion_matrix
    (/root/reference/src/TextClassification.py:892-949) — rows = true
    class, columns = predicted class, cell shade ∝ count, count text
    flips to white on dark cells.

    ``counts``: rows of ``evaluate.confusion_counts`` — any iterable of
    (label, pred, n) / dicts / Rows — or a 2×2 array [[tn, fp], [fn, tp]].
    """
    m = np.zeros((2, 2), dtype=np.int64)
    arr = np.asarray(counts, dtype=object)
    if arr.ndim == 2 and arr.shape == (2, 2) and not isinstance(arr[0][0], (dict,)):
        m = np.asarray(counts, dtype=np.int64)
    else:
        for row in counts:
            d = row.asDict() if hasattr(row, "asDict") else (
                row if isinstance(row, dict) else {"label": row[0], "pred": row[1], "n": row[2]}
            )
            m[int(d["label"]), int(d["pred"])] = int(d["n"])

    W, H = 480, 430
    c = Canvas(W, H)
    c.text(W / 2, 8, title, _INK, 2.0, "ct")
    ml, mt, mr, mb = 120, 70, 30, 60
    cw, ch = (W - ml - mr) / 2, (H - mt - mb) / 2
    base = np.array(_rgb(PALETTE[0]), float)
    light = np.array([234.0, 242.0, 252.0])
    dark = base * 0.55
    vmax = max(1, m.max())
    for i in range(2):  # true
        for j in range(2):  # pred
            t = m[i, j] / vmax
            # two-segment sequential ramp: light → base → dark
            if t <= 0.5:
                col = light + (base - light) * (2 * t)
            else:
                col = base + (dark - base) * (2 * t - 1)
            col = np.clip(col, 0, 255)
            x0, y0 = ml + j * cw, mt + i * ch
            c.rect(x0 + 1, y0 + 1, x0 + cw - 1, y0 + ch - 1, tuple(col.astype(int)))
            # text ink flips on dark cells (relative luminance)
            lum = 0.2126 * col[0] + 0.7152 * col[1] + 0.0722 * col[2]
            ink = (255, 255, 255) if lum < 140 else _INK
            c.text(x0 + cw / 2, y0 + ch / 2, str(int(m[i, j])), ink, 2.5, "cm")
    for j, name in enumerate(class_names):
        c.text(ml + j * cw + cw / 2, H - mb + 8, name, _INK_MUTED, 1.5, "ct")
    for i, name in enumerate(class_names):
        c.text(ml - 8, mt + i * ch + ch / 2, name, _INK_MUTED, 1.5, "rm")
    c.text(ml + (W - ml - mr) / 2, H - 18, "PREDICTED", _INK, 1.5, "ct")
    c.text(8, mt - 14, "TRUE", _INK, 1.5, "lt")
    if path:
        return c.save(path)
    return c.to_png()


def _word_count_rows(rows) -> list[tuple[str, int]]:
    out = []
    for row in rows:
        if hasattr(row, "asDict"):
            d = row.asDict()
            out.append((str(d["word"]), int(d["n"])))
        elif isinstance(row, dict):
            out.append((str(row["word"]), int(row["n"])))
        else:
            out.append((str(row[0]), int(row[1])))
    return out


def plot_word_frequencies(
    counts, path: str | None = None, title: str = "PREVALENCE OF FEATURES"
) -> bytes:
    """Top-k word-frequency bar chart with vertical term labels.

    Ref: plotSampleDistribution
    (/root/reference/src/NLP_functions.py:571-594) — a bar per top-N
    word, counts descending, term labels rotated 90°.

    ``counts``: collected ``textstats.top_k_words`` rows (word, n), or
    (word, n) tuples.
    """
    pairs = _word_count_rows(counts)
    n = max(1, len(pairs))
    ymax = max((c for _, c in pairs), default=1) * 1.05
    fig = Figure(
        width=max(640, 14 * n + 120), height=480,
        xlim=(-0.7, n - 0.3), ylim=(0.0, ymax),
        title=title, ylabel="FREQUENCY",
    )
    fig.mb = 110  # room for vertical term labels
    fig.axes(xticks=[], tick_fmt="{:.0f}")
    for i, (word, c) in enumerate(pairs):
        fig.bar(i, c, 0.8, PALETTE[0])
        fig.canvas.text(
            fig.px(i), fig.canvas.h - fig.mb + 6, word[:12], _INK_MUTED, 1.5, "ct", rot=90
        )
    return fig.save(path)


def plot_train_test_distribution(
    train_counts,
    test_counts,
    path: str | None = None,
    title: str = "TRAIN/TEST FEATURE DISTRIBUTION",
) -> bytes:
    """Paired train-vs-test bars over the train set's top words.

    Ref: plotTrainTestDistribution
    (/root/reference/src/NLP_functions.py:596-635) — the train top-N
    fixes the word order; each word shows its train and test counts
    side by side (missing in test → 0).
    """
    train = _word_count_rows(train_counts)
    test = dict(_word_count_rows(test_counts))
    n = max(1, len(train))
    ymax = max(
        [c for _, c in train] + [test.get(w, 0) for w, _ in train] + [1]
    ) * 1.05
    fig = Figure(
        width=max(640, 18 * n + 120), height=480,
        xlim=(-0.7, n - 0.3), ylim=(0.0, ymax),
        title=title, ylabel="FREQUENCY",
    )
    fig.mb = 110
    fig.axes(xticks=[], tick_fmt="{:.0f}")
    first = True
    for i, (word, c) in enumerate(train):
        fig.bar(i - 0.2, c, 0.38, PALETTE[0], label="TRAIN" if first else None)
        fig.bar(i + 0.2, test.get(word, 0), 0.38, PALETTE[1], label="TEST" if first else None)
        first = False
        fig.canvas.text(
            fig.px(i), fig.canvas.h - fig.mb + 6, word[:12], _INK_MUTED, 1.5, "ct", rot=90
        )
    fig.legend("tr")
    return fig.save(path)


def plot_feature_weights(
    pairs, path: str | None = None, title: str = "FEATURE WEIGHTS"
) -> bytes:
    """Signed coefficient / importance bars with vertical term labels.

    Ref: plot_coefficients
    (/root/reference/src/TextClassification.py:1243-1299) and
    plotFeatureImportance (src/NLP_functions.py:465-521) — bars of the
    top positive (blue) and top negative (red) weights, term labels
    rotated. Input order is preserved (callers pass negatives first,
    positives last, as the reference does).

    ``pairs``: (term, weight) tuples or rows from the M13 op.
    """
    data = []
    for row in pairs:
        if hasattr(row, "asDict"):
            d = row.asDict()
            data.append((
                str(d.get("term", d.get("word"))),
                float(d.get("weight", d.get("coef"))),
            ))
        elif isinstance(row, dict):
            data.append((str(row.get("term", row.get("word"))), float(row.get("weight", row.get("coef")))))
        else:
            data.append((str(row[0]), float(row[1])))
    n = max(1, len(data))
    ws = [w for _, w in data]
    lo, hi = min(ws + [0.0]), max(ws + [0.0])
    pad = (hi - lo) * 0.05 or 1.0
    fig = Figure(
        width=max(640, 16 * n + 120), height=480,
        xlim=(-0.7, n - 0.3), ylim=(lo - pad, hi + pad),
        title=title, ylabel="WEIGHT",
    )
    fig.mb = 110
    fig.axes(xticks=[], tick_fmt="{:.2f}")
    # zero baseline
    fig.canvas.line(fig.px(-0.7), fig.py(0), fig.px(n - 0.3), fig.py(0), _INK_MUTED, 1)
    for i, (term, w) in enumerate(data):
        color = PALETTE[7] if w < 0 else PALETTE[0]  # red negative, blue positive
        fig.bar(i, w, 0.8, color)
        fig.canvas.text(
            fig.px(i), fig.canvas.h - fig.mb + 6, term[:12], _INK_MUTED, 1.5, "ct", rot=90
        )
    return fig.save(path)


def plot_f1_scores(
    summary: dict, path: str | None = None, title: str = "F1-SCORE PER CLASSIFIER"
) -> bytes:
    """Mean-F1 bar per model with ±std error whiskers.

    Ref: plotF1scores (/root/reference/src/TextClassification.py:1302-1330)
    — one bar per classifier, black error bars, y = F1 ± std.

    ``summary``: ``harness.summary()`` (uses f1_mean/f1_std) or a plain
    name → (mean, std) mapping.
    """
    items = []
    for name, v in sorted(summary.items()):
        if isinstance(v, dict):
            items.append((name, float(v["f1_mean"]), float(v["f1_std"])))
        else:
            items.append((name, float(v[0]), float(v[1])))
    n = max(1, len(items))
    fig = Figure(
        width=max(640, 90 * n + 140), height=480,
        xlim=(-0.7, n - 0.3), ylim=(0.0, 1.0),
        title=title, ylabel="F1-SCORE +/- STD",
    )
    fig.axes(xticks=[])
    for i, (name, mean, std) in enumerate(items):
        fig.bar(i, mean, 0.7, PALETTE[0], alpha=0.6)
        hi = min(1.0, mean + std)
        fig.errorbar(i, max(0.0, mean - std), hi)
        fig.canvas.text(fig.px(i), fig.canvas.h - fig.mb + 6, name[:14], _INK_MUTED, 1.5, "ct")
        fig.canvas.text(fig.px(i), fig.py(hi) - 4, f"{mean:.2f}", _INK, 1.5, "cb")
    return fig.save(path)


def plot_metric_sweep(
    series: dict,
    path: str | None = None,
    title: str = "METRIC SWEEP",
    xlabel: str = "X",
    ylabel: str = "ROC-AUC",
    ylim=(0.5, 1.0),
) -> bytes:
    """Metric-vs-parameter line figure with point markers.

    Ref: plotPrevalencePR (/root/reference/src/TextClassification.py:
    1332-1424) and sampleSizeROC (src/NLP_functions.py:753-800) — AUC
    as prevalence / training-set size varies. ``series``: label →
    [(x, y), ...]; x may be log-ish (sample sizes) — points are drawn
    where they fall, no resampling.
    """
    pts_all = [p for pts in series.values() for p in pts]
    xmin = min((p[0] for p in pts_all), default=0.0)
    xmax = max((p[0] for p in pts_all), default=1.0)
    pad = (xmax - xmin) * 0.05 or 1.0
    fig = Figure(
        xlim=(xmin - pad, xmax + pad), ylim=ylim,
        title=title, xlabel=xlabel, ylabel=ylabel,
    )
    fig.axes(tick_fmt="{:.2f}")
    for i, (name, pts) in enumerate(sorted(series.items())):
        color = PALETTE[i % len(PALETTE)]
        pts = sorted((float(x), float(y)) for x, y in pts)
        fig.plot([p[0] for p in pts], [p[1] for p in pts], color, width=2.5, label=name)
        for x, y in pts:
            fig.canvas.disc(fig.px(x), fig.py(y), 4, color)
    fig.legend("br")
    return fig.save(path)


def plot_cutoff(
    points,
    path: str | None = None,
    title: str = "RECEIVER OPERATING CHARACTERISTIC",
) -> bytes:
    """Sensitivity/specificity cut-off plot (the CutOffPlot_*.png family).

    Ref: optimalCutoff(plot=True) (/root/reference/src/NLP_functions.py:
    229-257) — tpr and 1−fpr drawn as two lines over the descending
    threshold index, with the 'optimal' cut-off visible as their
    intersection (argmin |tpr − (1−fpr)|, the same row
    operators/evaluate.py:optimal_cutoff_youden returns). The reference
    blanks the x tick labels (the axis is ordinal threshold rank);
    this renders the same way and additionally drops a marker line at
    the intersection with the cut-off score in the legend.

    ``points``: (score, tpr, fpr) rows ordered by score DESCENDING —
    exactly the E2 curve (curve_by_threshold) at a bounded point
    budget. Pure driver-side rasterization; byte-deterministic.
    """
    pts = list(points)
    if not pts:
        raise ValueError("plot_cutoff needs a non-empty curve")
    tpr = np.array([p[1] for p in pts], float)
    spec = 1.0 - np.array([p[2] for p in pts], float)
    n = len(pts)
    xs = np.linspace(0.0, 1.0, n) if n > 1 else np.array([0.5])
    i_star = int(np.argmin(np.abs(tpr - spec)))
    cutoff = float(pts[i_star][0])
    fig = Figure(title=title, xlabel="THRESHOLD RANK", ylabel="RATE")
    fig.axes(xticks=[])  # ordinal axis — the reference blanks these too
    fig.plot(
        [xs[i_star], xs[i_star]], [0.0, 1.0], _INK_MUTED, width=1.5,
        alpha=0.9, label=f"CUT-OFF = {cutoff:.2f}",
    )
    fig.plot(xs, tpr, PALETTE[0], width=2.5, label="SENSITIVITY (TPR)")
    fig.plot(xs, spec, PALETTE[1], width=2.5, label="SPECIFICITY (1-FPR)")
    fig.legend("br")
    return fig.save(path)


def plot_histogram(
    bins,
    path: str | None = None,
    title: str = "DISTRIBUTION",
    xlabel: str = "VALUE",
) -> bytes:
    """Histogram bars from ``textstats.value_histogram`` rows.

    Contiguous bars on the value axis; empty bins render as gaps at
    zero height. Under/overflow buckets (bin 0 / n+1) carry edges one
    step outside [lo, hi], so truncated mass is visible at the plot's
    margins rather than silently dropped.
    """
    rows = []
    for row in bins:
        d = row.asDict() if hasattr(row, "asDict") else (
            row if isinstance(row, dict) else
            {"bin": row[0], "lo_edge": row[1], "hi_edge": row[2], "n": row[3]}
        )
        rows.append((int(d["bin"]), float(d["lo_edge"]), float(d["hi_edge"]), int(d["n"])))
    if not rows:
        rows = [(1, 0.0, 1.0, 0)]
    xmin = min(r[1] for r in rows)
    xmax = max(r[2] for r in rows)
    ymax = max(r[3] for r in rows) * 1.05 or 1.0
    fig = Figure(
        xlim=(xmin, xmax), ylim=(0.0, ymax), title=title,
        xlabel=xlabel, ylabel="COUNT",
    )
    fig.axes(tick_fmt="{:.2f}")
    for _b, lo, hi, n in rows:
        fig.bar((lo + hi) / 2, n, hi - lo, PALETTE[0])
    return fig.save(path)


def plot_lexical_dispersion(
    rows,
    terms,
    path: str | None = None,
    title: str = "LEXICAL DISPERSION",
    x_col: str = "doc_id",
) -> bytes:
    """Dispersion strip: one row per term, a tick per occurrence.

    Ref: plotLexicalDispersion
    (/root/reference/src/NLP_functions.py:523-567) (yellowbrick
    DispersionPlot) — x = position across the corpus, y = term.

    ``rows``: collected ``textstats.lexical_dispersion`` output
    (doc_id, term, position); ``terms`` fixes the y-order (top terms
    first, same as the reference's tf-idf ranking).
    """
    terms = [str(t) for t in terms]
    order = {t: i for i, t in enumerate(terms)}
    pts = []
    for row in rows:
        d = row.asDict() if hasattr(row, "asDict") else (
            row if isinstance(row, dict) else {"doc_id": row[0], "term": row[1], "position": row[2]}
        )
        t = str(d["term"])
        if t in order:
            pts.append((float(d[x_col]), order[t]))
    xmax = max((x for x, _ in pts), default=1.0) * 1.02 or 1.0
    n = len(terms)
    fig = Figure(
        width=720, height=max(300, 26 * n + 110),
        xlim=(0.0, xmax), ylim=(n - 0.5, -0.5),  # first term on top
        title=title, xlabel="DOCUMENT",
    )
    fig.ml = 110  # room for term labels
    fig.axes(yticks=[], tick_fmt="{:.0f}")
    for i, t in enumerate(terms):
        fig.canvas.text(fig.ml - 6, fig.py(i), t[:14], _INK_MUTED, 1.5, "rm")
    for x, yi in pts:
        X, Y = fig.px(x), fig.py(yi)
        fig.canvas.line(X, Y - 5, X, Y + 5, PALETTE[0], 1.5, alpha=0.85)
    return fig.save(path)


def plot_swarm(
    points,
    path: str | None = None,
    class_names=("NEGATIVE", "POSITIVE"),
    title: str = "PREDICTED PROBABILITIES",
) -> bytes:
    """Per-class strip/swarm of predicted probabilities.

    Ref: plotSwarm (/root/reference/src/TextClassification.py:986-1019)
    — seaborn swarmplot of score by true class. Here: deterministic
    md5 jitter (no RNG, byte-stable across machines), one categorical
    hue per class.

    ``points``: iterable of (label, score) — ``evaluate.swarm_points``
    collected rows.
    """
    pts = []
    for row in points:
        if hasattr(row, "asDict"):
            d = row.asDict()
            pts.append((int(d["label"]), float(d["score"])))
        elif isinstance(row, dict):
            pts.append((int(row["label"]), float(row["score"])))
        else:
            pts.append((int(row[0]), float(row[1])))
    fig = Figure(xlim=(-0.5, 1.5), ylim=(0.0, 1.0), title=title, ylabel="SCORE")
    fig.axes(xticks=[], yticks=np.linspace(0, 1, 6))
    for i, (lbl, score) in enumerate(pts):
        # deterministic jitter in [-0.18, 0.18] from a content hash
        h = int(hashlib.md5(f"{i}:{score:.12g}".encode()).hexdigest()[:8], 16)
        jitter = (h / 0xFFFFFFFF - 0.5) * 0.36
        fig.scatter([lbl + jitter], [score], PALETTE[lbl % len(PALETTE)], r=2.0, alpha=0.8)
    for j, name in enumerate(class_names):
        fig.canvas.text(fig.px(j), fig.canvas.h - fig.mb + 6, name, _INK_MUTED, 1.5, "ct")
    return fig.save(path)


def plot_calibration(bins, path: str | None = None, title: str = "CALIBRATION") -> bytes:
    """Reliability diagram from :func:`~...evaluate.calibration_bins`
    rows: empirical positive rate vs mean predicted score per bin,
    with the perfect-calibration diagonal. Driver-side rasterization
    of a ≤n_bins-row table; byte-deterministic.
    """
    rows = []
    for row in bins:
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        rows.append(
            (int(d["bin"]), int(d["n"]), d["mean_score_micro"] / 1e6,
             d["pos_rate_micro"] / 1e6)
        )
    if not rows:
        raise ValueError("plot_calibration needs at least one bin")
    rows.sort()
    xs = [r[2] for r in rows]
    ys = [r[3] for r in rows]
    fig = Figure(title=title, xlabel="MEAN PREDICTED SCORE", ylabel="POSITIVE RATE")
    fig.axes()
    fig.plot([0, 1], [0, 1], _INK_MUTED, width=1.5, alpha=0.8, label="PERFECT")
    fig.plot(xs, ys, PALETTE[0], width=2.5, label="MODEL")
    fig.scatter(xs, ys, PALETTE[0], r=3.5)
    fig.legend("br")
    return fig.save(path)


def plot_survival(
    groups: dict,
    path: str | None = None,
    title: str = "KAPLAN-MEIER SURVIVAL",
) -> bytes:
    """Step plot of Kaplan-Meier curves per group.

    ``groups``: name → list of (t, survival_micro) sorted by t (the
    :func:`~...experiment.kaplan_meier` rows for that group). Curves
    start at (0, 1.0) and step down at each event time — the standard
    right-continuous KM rendering. Byte-deterministic.
    """
    if not groups:
        raise ValueError("plot_survival needs at least one group")
    tmax = max((pts[-1][0] for pts in groups.values() if pts), default=1) or 1
    fig = Figure(
        xlim=(0.0, float(tmax)), ylim=(0.0, 1.0), title=title,
        xlabel="TIME", ylabel="SURVIVAL",
    )
    fig.axes(tick_fmt="{:.1f}")
    for i, (name, pts) in enumerate(sorted(groups.items())):
        color = PALETTE[i % len(PALETTE)]
        xs, ys = [0.0], [1.0]
        for t, s_micro in pts:
            s = s_micro / 1e6
            xs.extend([float(t), float(t)])   # vertical drop at t
            ys.extend([ys[-1], s])
        xs.append(float(tmax))
        ys.append(ys[-1])
        fig.plot(xs, ys, color, width=2.5, label=str(name).upper())
    fig.legend("tr")
    return fig.save(path)
