"""A functional PyQt5 stub: lets the real UI classes construct and wire.

PyQt5 is not installable in this environment (VERDICT round-2 item 7), so
the Qt glue — tab construction, signal->slot wiring in
MainWindow._connect_signals, wizard navigation — is exercised against this
stub: signals are real (connect/emit work, so a renamed slot raises
AttributeError at construction), widgets are permissive recorders with
sane return values for the methods the tabs actually read.

Install with ``install()`` BEFORE anything imports PyQt5. Run in a fresh
subprocess (tests/qt_glue_driver.py) so the stub never leaks into other
tests' import caches.
"""

from __future__ import annotations

import sys
import types


class Signal:
    def __init__(self):
        self._slots = []

    def connect(self, slot):
        assert callable(slot), f"connect target not callable: {slot!r}"
        self._slots.append(slot)

    def disconnect(self, slot=None):
        if slot is None:
            self._slots = []
        elif slot in self._slots:
            self._slots.remove(slot)

    def emit(self, *args):
        for s in list(self._slots):
            s(*args)


class pyqtSignal:
    """Class-level declaration; per-instance Signal on access."""

    _count = 0

    def __init__(self, *types, **kw):
        pyqtSignal._count += 1
        self._name = f"_pyqtsig_{pyqtSignal._count}"

    def __get__(self, obj, objtype=None):
        if obj is None:
            return self
        sig = obj.__dict__.get(self._name)
        if sig is None:
            sig = Signal()
            obj.__dict__[self._name] = sig
        return sig


def pyqtSlot(*a, **k):
    def deco(fn):
        return fn

    return deco


# Names that behave as widget signals when accessed on any stub widget.
_WIDGET_SIGNALS = {
    "clicked", "pressed", "released", "toggled", "stateChanged",
    "valueChanged", "textChanged", "textEdited", "editingFinished",
    "currentIndexChanged", "currentTextChanged", "activated",
    "currentChanged", "itemSelectionChanged", "itemDoubleClicked",
    "itemClicked", "returnPressed", "sliderMoved", "anchorClicked",
    "triggered", "timeout", "customContextMenuRequested",
}

# Return values for getters the tabs actually read.
_GETTER_DEFAULTS = {
    "text": "", "toPlainText": "", "currentText": "", "currentIndex": 0,
    "value": 0, "isChecked": False, "isEnabled": True, "isVisible": False,
    "count": 0, "currentRow": 0, "itemText": "", "placeholderText": "",
    "selectedItems": [], "currentItem": None, "item": None,
    "checkState": 0, "width": 640, "height": 480, "maximum": 100,
    "minimum": 0, "findText": -1, "itemData": None, "currentData": None,
    "styleSheet": "", "windowTitle": "", "isHidden": True,
    "documentTitle": "", "horizontalScrollBar": None,
    "verticalScrollBar": None, "tabText": "",
}


class QObject:
    def __init__(self, *args, **kwargs):
        self._children = []
        self._qt_props = {}

    def __getattr__(self, name):
        # Only called when normal lookup fails: synthesise widget signals
        # and permissive no-op SETTERS. Anything else must raise so that
        # getattr(obj, "x", None) probing and typo'd slot references keep
        # their real-Qt semantics (that probing pattern is how MainWindow
        # finds its optional theme_manager).
        if name.startswith("__") or name.startswith("_pyqtsig"):
            raise AttributeError(name)
        if name in _WIDGET_SIGNALS:
            sig = Signal()
            self.__dict__[name] = sig
            return sig
        if name in _GETTER_DEFAULTS:
            val = _GETTER_DEFAULTS[name]
            return lambda *a, **k: val
        import re

        if re.match(r"^(set|add|remove|insert|clear|update|apply|resize|"
                    r"adjust|move|raise_|lower|scroll|ensure|install|"
                    r"open|begin|end)[A-Z_]", name):
            return lambda *a, **k: None
        raise AttributeError(
            f"{type(self).__name__} stub has no attribute {name!r}")

    # Commonly-read structure methods with useful behavior --------------
    def setObjectName(self, n):
        self._qt_props["objectName"] = n

    def objectName(self):
        return self._qt_props.get("objectName", "")


class QWidget(QObject):
    def __init__(self, parent=None, **kw):
        super().__init__()
        self.parent_widget = parent
        self._layout = None
        self._enabled = True
        self._visible = False

    def setLayout(self, layout):
        self._layout = layout

    def layout(self):
        return self._layout

    def setEnabled(self, v):
        self._enabled = bool(v)

    def isEnabled(self):
        return self._enabled

    def setVisible(self, v):
        self._visible = bool(v)

    def show(self):
        self._visible = True

    def hide(self):
        self._visible = False

    def isVisible(self):
        return self._visible

    def setParent(self, p):
        self.parent_widget = p


class _Layout(QObject):
    def __init__(self, parent=None):
        super().__init__()
        self.items = []
        if parent is not None and hasattr(parent, "setLayout"):
            parent.setLayout(self)

    def addWidget(self, w, *a, **k):
        self.items.append(w)

    def addLayout(self, l, *a, **k):
        self.items.append(l)

    def addRow(self, *a, **k):
        self.items.extend(a)

    def addStretch(self, *a):
        pass

    def addSpacing(self, *a):
        pass

    def insertWidget(self, idx, w, *a, **k):
        self.items.insert(idx, w)

    def count(self):
        return len(self.items)


class QVBoxLayout(_Layout):
    pass


class QHBoxLayout(_Layout):
    pass


class QFormLayout(_Layout):
    pass


class QGridLayout(_Layout):
    pass


class QLabel(QWidget):
    def __init__(self, text="", parent=None, **kw):
        super().__init__(parent)
        self._text = text

    def setText(self, t):
        self._text = t

    def text(self):
        return self._text

    def setPixmap(self, p):
        self._pixmap = p

    def pixmap(self):
        return getattr(self, "_pixmap", None)


class QPushButton(QWidget):
    def __init__(self, text="", parent=None, **kw):
        super().__init__(parent)
        self._text = text

    def setText(self, t):
        self._text = t

    def text(self):
        return self._text


class QLineEdit(QWidget):
    def __init__(self, text="", parent=None, **kw):
        super().__init__(parent)
        self._text = text

    def setText(self, t):
        self._text = str(t)
        self.textChanged.emit(self._text)

    def text(self):
        return self._text


class QTextEdit(QWidget):
    def __init__(self, *a, **kw):
        super().__init__()
        self._html = []

    def append(self, s):
        self._html.append(s)

    def toPlainText(self):
        return "\n".join(self._html)

    def setReadOnly(self, v):
        pass

    def clear(self):
        self._html = []


class QTextBrowser(QTextEdit):
    def setHtml(self, h):
        self._html = [h]


class QComboBox(QWidget):
    def __init__(self, parent=None, **kw):
        super().__init__(parent)
        self._items = []
        self._data = []
        self._idx = -1

    def addItem(self, text, data=None):
        self._items.append(str(text))
        self._data.append(data)
        if self._idx < 0:
            self._idx = 0

    def addItems(self, texts):
        for t in texts:
            self.addItem(t)

    def clear(self):
        self._items, self._data, self._idx = [], [], -1

    def count(self):
        return len(self._items)

    def currentIndex(self):
        return self._idx

    def setCurrentIndex(self, i):
        if -1 <= i < len(self._items):
            self._idx = i
            self.currentIndexChanged.emit(i)
            if i >= 0:
                self.currentTextChanged.emit(self._items[i])

    def currentText(self):
        return self._items[self._idx] if 0 <= self._idx < len(self._items) else ""

    def currentData(self):
        return self._data[self._idx] if 0 <= self._idx < len(self._data) else None

    def itemText(self, i):
        return self._items[i] if 0 <= i < len(self._items) else ""

    def itemData(self, i):
        return self._data[i] if 0 <= i < len(self._data) else None

    def findText(self, t):
        try:
            return self._items.index(str(t))
        except ValueError:
            return -1

    def setCurrentText(self, t):
        i = self.findText(t)
        if i >= 0:
            self.setCurrentIndex(i)


class QCheckBox(QWidget):
    def __init__(self, text="", parent=None, **kw):
        super().__init__(parent)
        self._text = text
        self._checked = False

    def setChecked(self, v):
        self._checked = bool(v)
        self.stateChanged.emit(2 if v else 0)
        self.toggled.emit(bool(v))

    def isChecked(self):
        return self._checked


class _SpinCommon(QWidget):
    def __init__(self, parent=None, **kw):
        super().__init__(parent)
        self._value = 0
        self._min, self._max = 0, 99

    def setRange(self, lo, hi):
        self._min, self._max = lo, hi

    def setMinimum(self, v):
        self._min = v

    def setMaximum(self, v):
        self._max = v

    def setValue(self, v):
        self._value = min(max(v, self._min), self._max)
        self.valueChanged.emit(self._value)

    def value(self):
        return self._value

    def setSingleStep(self, s):
        pass

    def setSuffix(self, s):
        pass

    def setDecimals(self, d):
        pass


class QSpinBox(_SpinCommon):
    pass


class QDoubleSpinBox(_SpinCommon):
    pass


class QSlider(_SpinCommon):
    def __init__(self, orientation=None, parent=None, **kw):
        super().__init__(parent)

    def setTickInterval(self, i):
        pass

    def setTickPosition(self, p):
        pass


class QProgressBar(_SpinCommon):
    def setFormat(self, f):
        pass


class QListWidgetItem:
    def __init__(self, text=""):
        self._text = text
        self._data = {}

    def text(self):
        return self._text

    def setData(self, role, val):
        self._data[role] = val

    def data(self, role):
        return self._data.get(role)


class QListWidget(QWidget):
    def __init__(self, parent=None, **kw):
        super().__init__(parent)
        self._items = []
        self._row = -1

    def addItem(self, item):
        if not isinstance(item, QListWidgetItem):
            item = QListWidgetItem(str(item))
        self._items.append(item)

    def clear(self):
        self._items, self._row = [], -1

    def count(self):
        return len(self._items)

    def item(self, i):
        return self._items[i] if 0 <= i < len(self._items) else None

    def currentItem(self):
        return self.item(self._row)

    def currentRow(self):
        return self._row

    def setCurrentRow(self, r):
        self._row = r
        self.itemSelectionChanged.emit()

    def selectedItems(self):
        it = self.currentItem()
        return [it] if it is not None else []


class QGroupBox(QWidget):
    def __init__(self, title="", parent=None, **kw):
        super().__init__(parent)
        self._title = title


class QTabWidget(QWidget):
    def __init__(self, parent=None, **kw):
        super().__init__(parent)
        self._tabs = []
        self._current = 0

    def addTab(self, w, label):
        self._tabs.append((w, label))
        return len(self._tabs) - 1

    def count(self):
        return len(self._tabs)

    def widget(self, i):
        return self._tabs[i][0] if 0 <= i < len(self._tabs) else None

    def tabText(self, i):
        return self._tabs[i][1] if 0 <= i < len(self._tabs) else ""

    def setTabText(self, i, t):
        if 0 <= i < len(self._tabs):
            self._tabs[i] = (self._tabs[i][0], t)

    def currentIndex(self):
        return self._current

    def setCurrentIndex(self, i):
        if 0 <= i < len(self._tabs):
            self._current = i
            self.currentChanged.emit(i)

    def setCurrentWidget(self, w):
        for i, (tw, _) in enumerate(self._tabs):
            if tw is w:
                self.setCurrentIndex(i)
                return

    def currentWidget(self):
        return self.widget(self._current)

    def setTabEnabled(self, i, v):
        pass

    def indexOf(self, w):
        for i, (tw, _) in enumerate(self._tabs):
            if tw is w:
                return i
        return -1


class QMainWindow(QWidget):
    def __init__(self, *a, **kw):
        super().__init__()
        self._central = None
        self._menubar = None
        self._statusbar = None

    def setCentralWidget(self, w):
        self._central = w

    def centralWidget(self):
        return self._central

    def menuBar(self):
        if self._menubar is None:
            self._menubar = _MenuBar()
        return self._menubar

    def statusBar(self):
        if self._statusbar is None:
            self._statusbar = _StatusBar()
        return self._statusbar

    def setWindowTitle(self, t):
        self._title = t

    def windowTitle(self):
        return getattr(self, "_title", "")

    def setFixedSize(self, *a):
        pass

    def resize(self, *a):
        pass

    def setWindowIcon(self, *a):
        pass

    def close(self):
        ev = types.SimpleNamespace(accepted=True,
                                   accept=lambda: None,
                                   ignore=lambda: None)
        if hasattr(self, "closeEvent"):
            self.closeEvent(ev)
        return True


class _Action(QObject):
    def __init__(self, text=""):
        super().__init__()
        self._text = text


class _Menu(QObject):
    def __init__(self, title=""):
        super().__init__()
        self._title = title
        self.actions = []

    def addAction(self, text, slot=None, *a):
        act = _Action(text if isinstance(text, str) else "")
        if slot is not None:
            assert callable(slot), f"menu slot not callable: {slot!r}"
            act.triggered.connect(slot)
        self.actions.append(act)
        return act

    def addSeparator(self):
        pass

    def addMenu(self, title):
        m = _Menu(title)
        self.actions.append(m)
        return m


class _MenuBar(_Menu):
    pass


class _StatusBar(QObject):
    def __init__(self):
        super().__init__()
        self.messages = []

    def showMessage(self, msg, *a):
        self.messages.append(msg)


class QMessageBox(QObject):
    Yes = 0x4000
    No = 0x10000
    Ok = 0x400
    Cancel = 0x400000
    Information = 1
    Warning = 2
    Critical = 3
    Question = 4
    # Class-level answer queue so tests can script dialogs.
    _answers = []

    @classmethod
    def _answer(cls, default):
        return cls._answers.pop(0) if cls._answers else default

    @classmethod
    def information(cls, *a, **k):
        return cls._answer(cls.Ok)

    @classmethod
    def warning(cls, *a, **k):
        return cls._answer(cls.Ok)

    @classmethod
    def critical(cls, *a, **k):
        return cls._answer(cls.Ok)

    @classmethod
    def question(cls, *a, **k):
        return cls._answer(cls.Yes)

    @classmethod
    def about(cls, *a, **k):
        return None


class QFileDialog(QObject):
    _next_paths = []

    @classmethod
    def getOpenFileName(cls, *a, **k):
        p = cls._next_paths.pop(0) if cls._next_paths else ""
        return (p, "*")

    @classmethod
    def getSaveFileName(cls, *a, **k):
        p = cls._next_paths.pop(0) if cls._next_paths else ""
        return (p, "*")

    @classmethod
    def getExistingDirectory(cls, *a, **k):
        return cls._next_paths.pop(0) if cls._next_paths else ""


class QApplication(QObject):
    _instance = None

    def __init__(self, argv=None):
        super().__init__()
        QApplication._instance = self

    @classmethod
    def instance(cls):
        return cls._instance

    def setPalette(self, p):
        self._palette = p

    def style(self):
        class _Style:
            def standardPalette(self):
                return QPalette()

        return _Style()

    def setStyleSheet(self, s):
        self._stylesheet = s

    def exec_(self):
        return 0

    def processEvents(self):
        pass


class QTimer(QObject):
    def __init__(self, parent=None):
        super().__init__()
        self._interval = 0
        self._active = False

    def start(self, ms=None):
        if ms is not None:
            self._interval = ms
        self._active = True

    def stop(self):
        self._active = False

    def isActive(self):
        return self._active

    def setInterval(self, ms):
        self._interval = ms

    def setSingleShot(self, v):
        pass

    @staticmethod
    def singleShot(ms, slot):
        slot()  # deterministic for tests: fire immediately


class _QtNamespace:
    AlignCenter = 0x84
    AlignLeft = 0x1
    AlignRight = 0x2
    Horizontal = 0x1
    Vertical = 0x2
    UserRole = 256
    Checked = 2
    Unchecked = 0
    KeepAspectRatio = 1
    SmoothTransformation = 1
    black = 2
    white = 3

    def __getattr__(self, name):  # palette roles, misc enums
        return 0


class QColor:
    def __init__(self, *a, **k):
        self.args = a

    def name(self):
        return "#000000"


class QPalette(QObject):
    Window = 10
    WindowText = 0
    Base = 9
    AlternateBase = 16
    Text = 6
    Button = 1
    ButtonText = 8
    Highlight = 12
    HighlightedText = 13
    ToolTipBase = 18
    ToolTipText = 19

    def setColor(self, *a):
        pass


class QImage:
    Format_RGB888 = 13
    Format_Grayscale8 = 24

    def __init__(self, *a, **k):
        pass


class QIcon:
    def __init__(self, *a, **k):
        self.args = a

    def isNull(self):
        return False


class QPixmap:
    def __init__(self, *a, **k):
        pass

    @staticmethod
    def fromImage(img):
        return QPixmap()

    def scaled(self, *a, **k):
        return self

    def isNull(self):
        return False


def install():
    """Register the stub as PyQt5 in sys.modules (idempotent)."""
    if "PyQt5" in sys.modules and getattr(sys.modules["PyQt5"], "_IS_STUB",
                                          False):
        return
    pkg = types.ModuleType("PyQt5")
    pkg._IS_STUB = True
    core = types.ModuleType("PyQt5.QtCore")
    widgets = types.ModuleType("PyQt5.QtWidgets")
    gui = types.ModuleType("PyQt5.QtGui")

    core.QObject = QObject
    core.pyqtSignal = pyqtSignal
    core.pyqtSlot = pyqtSlot
    core.Qt = _QtNamespace()
    core.QTimer = QTimer

    g = globals()
    for name in [
        "QWidget", "QMainWindow", "QTabWidget", "QVBoxLayout", "QHBoxLayout",
        "QFormLayout", "QGridLayout", "QLabel", "QPushButton", "QLineEdit",
        "QTextEdit", "QTextBrowser", "QComboBox", "QCheckBox", "QSpinBox",
        "QDoubleSpinBox", "QSlider", "QProgressBar", "QListWidget",
        "QListWidgetItem", "QGroupBox", "QMessageBox", "QFileDialog",
        "QApplication",
    ]:
        setattr(widgets, name, g[name])

    gui.QColor = QColor
    gui.QIcon = QIcon
    gui.QPalette = QPalette
    gui.QImage = QImage
    gui.QPixmap = QPixmap

    pkg.QtCore = core
    pkg.QtWidgets = widgets
    pkg.QtGui = gui
    sys.modules["PyQt5"] = pkg
    sys.modules["PyQt5.QtCore"] = core
    sys.modules["PyQt5.QtWidgets"] = widgets
    sys.modules["PyQt5.QtGui"] = gui
