// Optional OS-window presentation sink: blits the software renderer's RGB
// framebuffer into a real X11 window with mouse-drag orbit / scroll zoom /
// WASD fly-cam — the role of the reference's GLFW window + event callbacks
// (/root/reference/heligym/envs/renderer/src/gWindow.cpp:260-309), rebuilt
// for the TPU deployment reality: training pods are headless, so the
// renderer core must NEVER depend on a window system at build or load time.
//
// Design: libX11.so.6 is loaded with dlopen AT RUNTIME and the handful of
// Xlib entry points used here are self-declared against Xlib's stable,
// decades-frozen public ABI (struct layouts below). There is therefore no
// compile-time X11 dependency at all — this file builds on a headless pod
// with no X headers installed, and `window_show_native` simply reports
// "unavailable" when there is no libX11 or no DISPLAY. On a workstation (or
// under Xvfb) the same .so opens a real window.
//
// Event mapping (mirrors the reference's handlers, driving the SAME
// sr::Camera methods the ctypes camera_process_* API exposes):
//   left/right-drag  -> Camera::process_mouse   (mouse_callback)
//   scroll wheel     -> Camera::process_scroll  (scroll_callback)
//   W/A/S/D R/F      -> Camera::process_keyboard(FORWARD..DOWN, dt)
//   Shift            -> BOOST;  Escape or Q -> close request
#include <dlfcn.h>

#include <chrono>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <map>

#include "softrender.h"

namespace {

// ----------------------------------------------------------------- Xlib ABI
// Minimal self-declared subset of the Xlib public ABI (LP64). These layouts
// are fixed public interface contracts of libX11 (X11R5-era, unchanged).
typedef struct _XDisplay XDisplay;   // opaque
typedef struct _XVisual XVisual;     // opaque (only passed through)
typedef struct _XGC* XGC;            // GC is an opaque struct pointer
typedef unsigned long XID;           // Window / Atom / Time / KeySym

struct XImageABI {
  int width, height;
  int xoffset;
  int format;
  char* data;
  int byte_order;            // 0 = LSBFirst
  int bitmap_unit;
  int bitmap_bit_order;
  int bitmap_pad;
  int depth;
  int bytes_per_line;
  int bits_per_pixel;
  unsigned long red_mask, green_mask, blue_mask;
  char* obdata;
  struct {
    void* create_image;
    int (*destroy_image)(XImageABI*);
    unsigned long (*get_pixel)(XImageABI*, int, int);
    int (*put_pixel)(XImageABI*, int, int, unsigned long);
    void* sub_image;
    void* add_pixel;
  } f;
};

// XEvent is a union with leading `int type`, padded to 24 longs (192 bytes).
struct XEventABI {
  int type;
  long pad[24];
};

// Common prefix of key/button/motion events (Xlib.h XKeyEvent et al.).
struct XInputEventABI {
  int type;
  unsigned long serial;
  int send_event;
  XDisplay* display;
  XID window, root, subwindow;
  unsigned long time;
  int x, y, x_root, y_root;
  unsigned int state;
  unsigned int detail;       // keycode (key) / button (button); char is_hint
                             // for motion — unread here
  int same_screen;
};

struct XClientMessageABI {
  int type;
  unsigned long serial;
  int send_event;
  XDisplay* display;
  XID window;
  XID message_type;
  int format;
  union { char b[20]; short s[10]; long l[5]; } data;
};

// event masks / types / constants (X.h)
constexpr long kKeyPressMask = 1L << 0;
constexpr long kButtonPressMask = 1L << 2;
constexpr long kButtonReleaseMask = 1L << 3;
constexpr long kPointerMotionMask = 1L << 6;
constexpr long kButtonMotionMask = 1L << 13;
constexpr long kExposureMask = 1L << 15;
constexpr int kKeyPress = 2, kButtonPress = 4, kButtonRelease = 5,
              kMotionNotify = 6, kClientMessage = 33;
constexpr int kZPixmap = 2;

struct XFns {
  void* lib = nullptr;
  XDisplay* (*OpenDisplay)(const char*);
  int (*CloseDisplay)(XDisplay*);
  int (*DefaultScreen)(XDisplay*);
  XID (*RootWindow)(XDisplay*, int);
  XVisual* (*DefaultVisual)(XDisplay*, int);
  int (*DefaultDepth)(XDisplay*, int);
  unsigned long (*BlackPixel)(XDisplay*, int);
  XID (*CreateSimpleWindow)(XDisplay*, XID, int, int, unsigned, unsigned,
                            unsigned, unsigned long, unsigned long);
  int (*StoreName)(XDisplay*, XID, const char*);
  int (*SelectInput)(XDisplay*, XID, long);
  int (*MapWindow)(XDisplay*, XID);
  int (*DestroyWindow)(XDisplay*, XID);
  XGC (*CreateGC)(XDisplay*, XID, unsigned long, void*);
  int (*FreeGC)(XDisplay*, XGC);
  XImageABI* (*CreateImage)(XDisplay*, XVisual*, unsigned, int, int, char*,
                            unsigned, unsigned, int, int);
  int (*PutImage)(XDisplay*, XID, XGC, XImageABI*, int, int, int, int,
                  unsigned, unsigned);
  int (*Pending)(XDisplay*);
  int (*NextEvent)(XDisplay*, XEventABI*);
  int (*Flush)(XDisplay*);
  XID (*InternAtom)(XDisplay*, const char*, int);
  int (*SetWMProtocols)(XDisplay*, XID, XID*, int);
  unsigned long (*LookupKeysym)(void*, int);
  bool ok = false;
};

XFns* xfns() {
  static XFns fns;
  static bool tried = false;
  if (tried) return fns.ok ? &fns : nullptr;
  tried = true;
  fns.lib = dlopen("libX11.so.6", RTLD_LAZY | RTLD_LOCAL);
  if (!fns.lib) fns.lib = dlopen("libX11.so", RTLD_LAZY | RTLD_LOCAL);
  if (!fns.lib) return nullptr;
  auto get = [&](const char* name) { return dlsym(fns.lib, name); };
#define LOAD(field, sym)                                   \
  fns.field = reinterpret_cast<decltype(fns.field)>(get(sym)); \
  if (!fns.field) return nullptr
  LOAD(OpenDisplay, "XOpenDisplay");
  LOAD(CloseDisplay, "XCloseDisplay");
  LOAD(DefaultScreen, "XDefaultScreen");
  LOAD(RootWindow, "XRootWindow");
  LOAD(DefaultVisual, "XDefaultVisual");
  LOAD(DefaultDepth, "XDefaultDepth");
  LOAD(BlackPixel, "XBlackPixel");
  LOAD(CreateSimpleWindow, "XCreateSimpleWindow");
  LOAD(StoreName, "XStoreName");
  LOAD(SelectInput, "XSelectInput");
  LOAD(MapWindow, "XMapWindow");
  LOAD(DestroyWindow, "XDestroyWindow");
  LOAD(CreateGC, "XCreateGC");
  LOAD(FreeGC, "XFreeGC");
  LOAD(CreateImage, "XCreateImage");
  LOAD(PutImage, "XPutImage");
  LOAD(Pending, "XPending");
  LOAD(NextEvent, "XNextEvent");
  LOAD(Flush, "XFlush");
  LOAD(InternAtom, "XInternAtom");
  LOAD(SetWMProtocols, "XSetWMProtocols");
  LOAD(LookupKeysym, "XLookupKeysym");
#undef LOAD
  fns.ok = true;
  return &fns;
}

int mask_shift(unsigned long mask) {
  int s = 0;
  while (mask && !(mask & 1)) { mask >>= 1; ++s; }
  return s;
}

struct X11Sink {
  XDisplay* dpy = nullptr;
  XID win = 0;
  XGC gc = nullptr;
  XImageABI* img = nullptr;
  XID wm_delete = 0;
  int w = 0, h = 0;
  bool dragging = false;
  int last_x = 0, last_y = 0;
  std::chrono::steady_clock::time_point last_present;

  ~X11Sink() {
    XFns* x = xfns();
    if (!x || !dpy) return;
    if (img) img->f.destroy_image(img);   // frees the pixel buffer too
    if (gc) x->FreeGC(dpy, gc);
    if (win) x->DestroyWindow(dpy, win);
    x->CloseDisplay(dpy);
  }
};

std::map<sr::Window*, X11Sink*>& sinks() {
  static std::map<sr::Window*, X11Sink*> m;
  return m;
}

}  // namespace

extern "C" {

// 1 when an X display can actually be opened (libX11 present AND DISPLAY
// reachable), else 0. Cheap enough to call once at viewer construction.
int native_display_available() {
  XFns* x = xfns();
  if (!x) return 0;
  XDisplay* d = x->OpenDisplay(nullptr);
  if (!d) return 0;
  x->CloseDisplay(d);
  return 1;
}

// Open an OS window presenting `w`'s framebuffer. Returns 0 on success;
// -1 no libX11, -2 no display, -3 unsupported visual depth.
int window_show_native(sr::Window* w) {
  if (sinks().count(w)) return 0;
  XFns* x = xfns();
  if (!x) return -1;
  XDisplay* dpy = x->OpenDisplay(nullptr);
  if (!dpy) return -2;
  int scr = x->DefaultScreen(dpy);
  int depth = x->DefaultDepth(dpy, scr);
  if (depth != 24 && depth != 32) {
    x->CloseDisplay(dpy);
    return -3;
  }
  auto* s = new X11Sink;
  s->dpy = dpy;
  s->w = w->width;
  s->h = w->height;
  s->win = x->CreateSimpleWindow(dpy, x->RootWindow(dpy, scr), 0, 0,
                                 static_cast<unsigned>(s->w),
                                 static_cast<unsigned>(s->h), 0,
                                 x->BlackPixel(dpy, scr),
                                 x->BlackPixel(dpy, scr));
  x->StoreName(dpy, s->win, w->title.c_str());
  x->SelectInput(dpy, s->win,
                 kKeyPressMask | kButtonPressMask | kButtonReleaseMask |
                     kPointerMotionMask | kButtonMotionMask | kExposureMask);
  s->wm_delete = x->InternAtom(dpy, "WM_DELETE_WINDOW", 0);
  x->SetWMProtocols(dpy, s->win, &s->wm_delete, 1);
  x->MapWindow(dpy, s->win);
  // 32bpp ZPixmap image owning a malloc'd buffer (XDestroyImage frees it)
  char* data = static_cast<char*>(std::malloc(
      static_cast<size_t>(s->w) * s->h * 4));
  s->img = x->CreateImage(dpy, x->DefaultVisual(dpy, scr),
                          static_cast<unsigned>(depth), kZPixmap, 0, data,
                          static_cast<unsigned>(s->w),
                          static_cast<unsigned>(s->h), 32, 0);
  s->gc = x->CreateGC(dpy, s->win, 0, nullptr);
  s->last_present = std::chrono::steady_clock::now();
  x->Flush(dpy);
  sinks()[w] = s;
  w->visible = true;
  return 0;
}

// Blit the current framebuffer and pump input events into w->camera.
// Returns a bitmask: 1 = close requested (Escape/Q/WM close), 2 = camera
// input was applied this call (callers use it to hand the pose over to the
// fly-cam instead of the scripted chase camera). Negative: no native window.
int window_present_native(sr::Window* w) {
  auto it = sinks().find(w);
  if (it == sinks().end()) return -1;
  X11Sink* s = it->second;
  XFns* x = xfns();

  // RGB888 -> the visual's 32bpp layout, via the image's channel masks
  const int rs = mask_shift(s->img->red_mask),
            gs = mask_shift(s->img->green_mask),
            bs = mask_shift(s->img->blue_mask);
  const uint8_t* src = w->framebuffer.data();
  uint32_t* dst = reinterpret_cast<uint32_t*>(s->img->data);
  const size_t n = static_cast<size_t>(s->w) * s->h;
  for (size_t i = 0; i < n; ++i) {
    uint32_t px = (static_cast<uint32_t>(src[3 * i]) << rs) |
                  (static_cast<uint32_t>(src[3 * i + 1]) << gs) |
                  (static_cast<uint32_t>(src[3 * i + 2]) << bs);
    if (s->img->byte_order != 0) px = __builtin_bswap32(px);
    dst[i] = px;
  }
  x->PutImage(s->dpy, s->win, s->gc, s->img, 0, 0, 0, 0,
              static_cast<unsigned>(s->w), static_cast<unsigned>(s->h));
  x->Flush(s->dpy);

  auto now = std::chrono::steady_clock::now();
  float dt = std::chrono::duration<float>(now - s->last_present).count();
  s->last_present = now;
  if (dt > 0.1f) dt = 0.1f;

  int result = 0;
  XEventABI ev;
  while (x->Pending(s->dpy) > 0) {
    x->NextEvent(s->dpy, &ev);
    auto* ie = reinterpret_cast<XInputEventABI*>(&ev);
    switch (ev.type) {
      case kButtonPress:
        if (ie->detail == 4) {            // wheel up
          w->camera->process_scroll(1.0f);
          result |= 2;
        } else if (ie->detail == 5) {     // wheel down
          w->camera->process_scroll(-1.0f);
          result |= 2;
        } else {
          s->dragging = true;
          s->last_x = ie->x;
          s->last_y = ie->y;
        }
        break;
      case kButtonRelease:
        if (ie->detail != 4 && ie->detail != 5) s->dragging = false;
        break;
      case kMotionNotify:
        if (s->dragging) {
          // the reference's mouse_callback offsets: dx = x - last,
          // dy = last - y (screen y grows downward)
          w->camera->process_mouse(static_cast<float>(ie->x - s->last_x),
                                   static_cast<float>(s->last_y - ie->y));
          s->last_x = ie->x;
          s->last_y = ie->y;
          result |= 2;
        }
        break;
      case kKeyPress: {
        unsigned long ks = x->LookupKeysym(ie, 0);
        switch (ks) {
          case 'w': w->camera->process_keyboard(sr::CAM_FORWARD, dt); result |= 2; break;
          case 's': w->camera->process_keyboard(sr::CAM_BACKWARD, dt); result |= 2; break;
          case 'a': w->camera->process_keyboard(sr::CAM_LEFT, dt); result |= 2; break;
          case 'd': w->camera->process_keyboard(sr::CAM_RIGHT, dt); result |= 2; break;
          case 'r': w->camera->process_keyboard(sr::CAM_UP, dt); result |= 2; break;
          case 'f': w->camera->process_keyboard(sr::CAM_DOWN, dt); result |= 2; break;
          case 0xffe1: case 0xffe2:   // Shift_L / Shift_R
            w->camera->process_keyboard(sr::CAM_BOOST, dt); break;
          case 0xff1b: case 'q':      // Escape / q
            result |= 1; break;
          default: break;
        }
        break;
      }
      case kClientMessage: {
        auto* cm = reinterpret_cast<XClientMessageABI*>(&ev);
        if (static_cast<XID>(cm->data.l[0]) == s->wm_delete) result |= 1;
        break;
      }
      default:
        break;
    }
  }
  return result;
}

void window_hide_native(sr::Window* w) {
  auto it = sinks().find(w);
  if (it == sinks().end()) return;
  delete it->second;
  sinks().erase(it);
}

}  // extern "C"
