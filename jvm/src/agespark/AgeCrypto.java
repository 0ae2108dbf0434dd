package agespark;

import java.io.ByteArrayOutputStream;
import java.math.BigInteger;
import java.nio.charset.StandardCharsets;
import java.security.KeyFactory;
import java.security.KeyPair;
import java.security.KeyPairGenerator;
import java.security.PrivateKey;
import java.security.PublicKey;
import java.security.SecureRandom;
import java.security.interfaces.XECPublicKey;
import java.security.spec.NamedParameterSpec;
import java.security.spec.XECPrivateKeySpec;
import java.security.spec.XECPublicKeySpec;
import java.util.Arrays;
import java.util.Base64;
import javax.crypto.Cipher;
import javax.crypto.KeyAgreement;
import javax.crypto.Mac;
import javax.crypto.spec.IvParameterSpec;
import javax.crypto.spec.SecretKeySpec;

/**
 * JVM-side implementation of the age-encryption.org/v1 X25519 file format,
 * wire-compatible with the pure-Python path in duckdb_age_spark/crypto/
 * format.py (same public spec: C2SP/age).  Exists to escape the structural
 * JVM&lt;-&gt;Arrow&lt;-&gt;Python transfer ceiling on large payloads
 * (ROADMAP / VERDICT r7 item 3): with the cipher running inside the
 * executor JVM, payload bytes never cross the Python boundary.
 *
 * Pure JDK 17 — X25519 via XDH KeyAgreement, ChaCha20-Poly1305 and
 * HMAC-SHA256 via JCE, no external dependencies.  Interop (Java-encrypt →
 * Python-decrypt and the reverse) is pinned by tests/test_jvm_crypto.py.
 *
 * Scope notes (prototype, documented):
 *  - keys are bech32 literals ("age1...", "AGE-SECRET-KEY-1..."); secret-
 *    name resolution stays Python-side where the secrets snapshot lives.
 *  - single-recipient encrypt (the benchmark path); decrypt handles any
 *    number of stanzas, skipping non-matching ones like the Python path.
 *  - error messages reuse the reference taxonomy ("Invalid age recipient
 *    key: ...", "Decryption failed: ...") so SQL-surface behavior matches.
 */
public final class AgeCrypto {
    private AgeCrypto() {}

    static final byte[] VERSION_LINE = "age-encryption.org/v1".getBytes(StandardCharsets.US_ASCII);
    static final byte[] X25519_LABEL =
            "age-encryption.org/v1/X25519".getBytes(StandardCharsets.US_ASCII);
    static final int CHUNK_SIZE = 64 * 1024;
    static final int TAG_SIZE = 16;
    static final int FILE_KEY_SIZE = 16;
    static final int NONCE_SIZE = 16;

    private static final SecureRandom RNG = new SecureRandom();
    private static final NamedParameterSpec X25519 = NamedParameterSpec.X25519;

    // ---------------------------------------------------------------- bech32

    private static final String CHARSET = "qpzry9x8gf2tvdw0s3jn54khce6mua7l";
    private static final int[] GEN = {0x3B6A57B2, 0x26508E6D, 0x1EA119FA, 0x3D4233DD, 0x2A1462B3};

    private static int polymod(int[] values) {
        int chk = 1;
        for (int v : values) {
            int b = chk >>> 25;
            chk = ((chk & 0x1FFFFFF) << 5) ^ v;
            for (int i = 0; i < 5; i++) {
                if (((b >>> i) & 1) != 0) chk ^= GEN[i];
            }
        }
        return chk;
    }

    /** BIP-173 decode with HRP + checksum verification; returns data bytes. */
    static byte[] bech32Decode(String expectedHrp, String s) {
        for (int i = 0; i < s.length(); i++) {
            char c = s.charAt(i);
            if (c < 33 || c > 126) throw new IllegalArgumentException("invalid bech32 character");
        }
        String lowered = s.toLowerCase();
        if (!s.equals(lowered) && !s.equals(s.toUpperCase()))
            throw new IllegalArgumentException("mixed-case bech32 string");
        s = lowered;
        int pos = s.lastIndexOf('1');
        if (pos < 1 || pos + 7 > s.length() || s.length() > 1023)
            throw new IllegalArgumentException("invalid bech32 separator position");
        String hrp = s.substring(0, pos);
        if (!hrp.equals(expectedHrp.toLowerCase()))
            throw new IllegalArgumentException("unexpected bech32 prefix: " + hrp);
        String dataPart = s.substring(pos + 1);
        int[] data = new int[dataPart.length()];
        for (int i = 0; i < dataPart.length(); i++) {
            int v = CHARSET.indexOf(dataPart.charAt(i));
            if (v < 0) throw new IllegalArgumentException("invalid bech32 data character");
            data[i] = v;
        }
        int[] values = new int[hrp.length() * 2 + 1 + data.length];
        int k = 0;
        for (int i = 0; i < hrp.length(); i++) values[k++] = hrp.charAt(i) >>> 5;
        values[k++] = 0;
        for (int i = 0; i < hrp.length(); i++) values[k++] = hrp.charAt(i) & 31;
        System.arraycopy(data, 0, values, k, data.length);
        if (polymod(values) != 1) throw new IllegalArgumentException("invalid bech32 checksum");
        // convertbits 5 -> 8, no pad
        ByteArrayOutputStream out = new ByteArrayOutputStream();
        int acc = 0, bits = 0;
        for (int i = 0; i < data.length - 6; i++) {
            acc = ((acc << 5) | data[i]) & 0xFFF;
            bits += 5;
            while (bits >= 8) {
                bits -= 8;
                out.write((acc >>> bits) & 0xFF);
            }
        }
        if (bits >= 5 || ((acc << (8 - bits)) & 0xFF) != 0)
            throw new IllegalArgumentException("invalid padding in base conversion");
        return out.toByteArray();
    }

    static byte[] decodeRecipient(String key) {
        byte[] raw = bech32Decode("age", key);
        if (raw.length != 32) throw new IllegalArgumentException("bad recipient length");
        return raw;
    }

    static byte[] decodeIdentity(String key) {
        byte[] raw = bech32Decode("age-secret-key-", key);
        if (raw.length != 32) throw new IllegalArgumentException("bad identity length");
        return raw;
    }

    // ------------------------------------------------------------- primitives

    static byte[] hmacSha256(byte[] key, byte[] msg) {
        try {
            Mac mac = Mac.getInstance("HmacSHA256");
            // HMAC forbids an empty key; RFC 5869's default salt is HashLen
            // zero bytes, which HMAC's zero-padding makes equivalent.
            mac.init(new SecretKeySpec(key.length == 0 ? new byte[32] : key, "HmacSHA256"));
            return mac.doFinal(msg);
        } catch (Exception e) {
            throw new IllegalStateException(e);
        }
    }

    /** HKDF-SHA256 with a single 32-byte output block (all age derivations). */
    static byte[] hkdf(byte[] ikm, byte[] salt, byte[] info) {
        byte[] prk = hmacSha256(salt, ikm);
        byte[] msg = Arrays.copyOf(info, info.length + 1);
        msg[info.length] = 1;
        return hmacSha256(prk, msg);
    }

    static byte[] chacha(int mode, byte[] key, byte[] nonce12, byte[] data) throws Exception {
        Cipher c = Cipher.getInstance("ChaCha20-Poly1305");
        c.init(mode, new SecretKeySpec(key, "ChaCha20"), new IvParameterSpec(nonce12));
        return c.doFinal(data);
    }

    /** RFC 7748 u-coordinate decode: little-endian, bit 255 cleared. */
    static PublicKey rawToPublic(byte[] raw) throws Exception {
        byte[] le = raw.clone();
        le[31] &= 0x7F;
        byte[] be = new byte[32];
        for (int i = 0; i < 32; i++) be[i] = le[31 - i];
        BigInteger u = new BigInteger(1, be);
        return KeyFactory.getInstance("X25519").generatePublic(new XECPublicKeySpec(X25519, u));
    }

    static PrivateKey rawToPrivate(byte[] raw) throws Exception {
        return KeyFactory.getInstance("X25519")
                .generatePrivate(new XECPrivateKeySpec(X25519, raw));
    }

    static byte[] publicToRaw(PublicKey pk) {
        BigInteger u = ((XECPublicKey) pk).getU();
        byte[] be = u.toByteArray();
        byte[] le = new byte[32];
        for (int i = 0; i < be.length && i < 32; i++) le[i] = be[be.length - 1 - i];
        return le;
    }

    static byte[] x25519(PrivateKey sk, PublicKey pk) throws Exception {
        KeyAgreement ka = KeyAgreement.getInstance("X25519");
        ka.init(sk);
        ka.doPhase(pk, true);
        byte[] shared = ka.generateSecret();
        // the JDK already rejects all-zero (small-order) results, but keep
        // the explicit contributory check the Python path documents
        boolean zero = true;
        for (byte b : shared) if (b != 0) { zero = false; break; }
        if (zero) throw new IllegalArgumentException("low-order X25519 share");
        return shared;
    }

    private static final Base64.Encoder B64 = Base64.getEncoder().withoutPadding();
    private static final Base64.Decoder B64D = Base64.getDecoder();

    static byte[] b64decodeCanonical(String s) {
        if (s.endsWith("=")) throw new IllegalArgumentException("base64 padding not allowed");
        byte[] out;
        try {
            out = B64D.decode(s);
        } catch (IllegalArgumentException e) {
            throw new IllegalArgumentException("invalid base64 in age header");
        }
        if (!B64.encodeToString(out).equals(s))
            throw new IllegalArgumentException("non-canonical base64 in age header");
        return out;
    }

    // ---------------------------------------------------------------- encrypt

    static void wrapBody(StringBuilder sb, String b64Body) {
        int n = b64Body.length();
        int i = 0;
        for (; i + 64 <= n; i += 64) {
            sb.append(b64Body, i, i + 64).append('\n');
        }
        // final line strictly shorter than 64 (possibly empty)
        sb.append(b64Body, i, n);
    }

    public static byte[] encrypt(byte[] plaintext, byte[] recipientRaw) throws Exception {
        return encrypt(plaintext, recipientRaw, rawToPublic(recipientRaw));
    }

    /** Hot-path overload: callers that encrypt many rows to one recipient
     * pass the pre-parsed key object (the analog of the Python path's
     * lru_cache key memoization — parsing is ~µs/row otherwise). */
    public static byte[] encrypt(byte[] plaintext, byte[] recipientRaw, PublicKey recipientKey)
            throws Exception {
        return encryptMulti(plaintext, new byte[][] {recipientRaw},
                new PublicKey[] {recipientKey});
    }

    /** One X25519 recipient stanza: fresh ephemeral keypair per stanza,
     * wrap key = HKDF(shared, eph_share || recipient_raw, label) — same
     * construction as crypto/format.py::_x25519_stanza. */
    private static void appendX25519Stanza(
            StringBuilder header, byte[] fileKey, byte[] recipientRaw, PublicKey recipientKey)
            throws Exception {
        KeyPairGenerator kpg = KeyPairGenerator.getInstance("X25519");
        KeyPair eph = kpg.generateKeyPair();
        byte[] ephShare = publicToRaw(eph.getPublic());
        byte[] shared = x25519(eph.getPrivate(), recipientKey);
        byte[] saltCat = new byte[64];
        System.arraycopy(ephShare, 0, saltCat, 0, 32);
        System.arraycopy(recipientRaw, 0, saltCat, 32, 32);
        byte[] wrapKey = hkdf(shared, saltCat, X25519_LABEL);
        byte[] sealedKey = chacha(Cipher.ENCRYPT_MODE, wrapKey, new byte[12], fileKey);
        header.append("-> X25519 ").append(B64.encodeToString(ephShare)).append('\n');
        wrapBody(header, B64.encodeToString(sealedKey));
        header.append('\n');
    }

    /** Multi-recipient encrypt: ONE file key sealed under N recipient
     * stanzas (any identity decrypts — the any-of-N contract pinned by the
     * Python path's tests).  Wire-compatible with crypto/format.py::encrypt
     * at every N. */
    public static byte[] encryptMulti(
            byte[] plaintext, byte[][] recipientRaws, PublicKey[] recipientKeys)
            throws Exception {
        byte[] fileKey = new byte[FILE_KEY_SIZE];
        RNG.nextBytes(fileKey);

        StringBuilder header = new StringBuilder();
        header.append("age-encryption.org/v1\n");
        for (int i = 0; i < recipientRaws.length; i++) {
            appendX25519Stanza(header, fileKey, recipientRaws[i], recipientKeys[i]);
        }
        header.append("---");
        byte[] headerNoMac = header.toString().getBytes(StandardCharsets.US_ASCII);
        byte[] macKey = hkdf(fileKey, new byte[0], "header".getBytes(StandardCharsets.US_ASCII));
        byte[] mac = hmacSha256(macKey, headerNoMac);
        header.append(' ').append(B64.encodeToString(mac)).append('\n');

        byte[] nonce = new byte[NONCE_SIZE];
        RNG.nextBytes(nonce);
        byte[] payloadKey = hkdf(fileKey, nonce, "payload".getBytes(StandardCharsets.US_ASCII));

        int nChunks = Math.max(1, (plaintext.length + CHUNK_SIZE - 1) / CHUNK_SIZE);
        ByteArrayOutputStream out = new ByteArrayOutputStream(
                header.length() + NONCE_SIZE + plaintext.length + TAG_SIZE * nChunks);
        out.writeBytes(header.toString().getBytes(StandardCharsets.US_ASCII));
        out.writeBytes(nonce);
        for (int i = 0; i < nChunks; i++) {
            int from = i * CHUNK_SIZE;
            int to = Math.min(plaintext.length, from + CHUNK_SIZE);
            boolean fin = i == nChunks - 1;
            out.writeBytes(chacha(Cipher.ENCRYPT_MODE, payloadKey, chunkNonce(i, fin),
                    Arrays.copyOfRange(plaintext, from, to)));
        }
        return out.toByteArray();
    }

    static byte[] chunkNonce(long counter, boolean fin) {
        byte[] nonce = new byte[12];
        for (int i = 10; i >= 0; i--) {
            nonce[i] = (byte) (counter & 0xFF);
            counter >>>= 8;
        }
        nonce[11] = fin ? (byte) 1 : 0;
        return nonce;
    }

    // ---------------------------------------------------------------- decrypt

    private static int findNewline(byte[] buf, int pos) {
        for (int i = pos; i < buf.length; i++) if (buf[i] == '\n') return i;
        throw new IllegalArgumentException("truncated age header");
    }

    public static byte[] decrypt(byte[] ciphertext, byte[] identityRaw) throws Exception {
        PrivateKey sk = rawToPrivate(identityRaw);
        return decrypt(ciphertext, sk, publicToRaw(kpFromPrivate(sk)));
    }

    /** Hot-path overload: pre-parsed identity + its public share (the
     * base-point multiplication is the expensive part — once per key, not
     * once per row). */
    public static byte[] decrypt(byte[] ciphertext, PrivateKey sk, byte[] ourPub)
            throws Exception {
        int nl = findNewline(ciphertext, 0);
        if (!Arrays.equals(Arrays.copyOfRange(ciphertext, 0, nl), VERSION_LINE))
            throw new IllegalArgumentException("not an age file (bad version line)");
        int pos = nl + 1;

        byte[] fileKey = null;
        int macEnd;
        String macLine;
        while (true) {
            nl = findNewline(ciphertext, pos);
            String line = new String(ciphertext, pos, nl - pos, StandardCharsets.US_ASCII);
            pos = nl + 1;
            if (line.startsWith("--- ") || line.equals("---")) {
                macEnd = pos;
                macLine = line;
                break;
            }
            if (!line.startsWith("-> "))
                throw new IllegalArgumentException("malformed age header stanza");
            String[] args = line.substring(3).split(" ");
            StringBuilder body = new StringBuilder();
            while (true) {
                nl = findNewline(ciphertext, pos);
                String bline = new String(ciphertext, pos, nl - pos, StandardCharsets.US_ASCII);
                pos = nl + 1;
                body.append(bline);
                if (bline.length() < 64) break;
            }
            if (!args[0].equals("X25519")) continue; // unknown stanza: skip, keep MACing
            if (args.length != 2) throw new IllegalArgumentException("malformed X25519 stanza");
            if (fileKey != null) continue;
            byte[] ephShare = b64decodeCanonical(args[1]);
            if (ephShare.length != 32)
                throw new IllegalArgumentException("malformed X25519 ephemeral share");
            byte[] shared;
            try {
                shared = x25519(sk, rawToPublic(ephShare));
            } catch (Exception e) {
                throw new IllegalArgumentException("low-order X25519 share");
            }
            byte[] saltCat = new byte[64];
            System.arraycopy(ephShare, 0, saltCat, 0, 32);
            System.arraycopy(ourPub, 0, saltCat, 32, 32);
            byte[] wrapKey = hkdf(shared, saltCat, X25519_LABEL);
            byte[] unwrapped;
            try {
                unwrapped = chacha(Cipher.DECRYPT_MODE, wrapKey, new byte[12],
                        b64decodeCanonical(body.toString()));
            } catch (Exception e) {
                continue; // not for this identity; keep scanning stanzas
            }
            if (unwrapped.length != FILE_KEY_SIZE)
                throw new IllegalArgumentException("invalid file key size");
            fileKey = unwrapped;
        }
        if (fileKey == null) throw new IllegalArgumentException("no matching key found");

        // verify header MAC over bytes through "---"
        int headerLen = macEnd - (macLine.length() + 1) + 3;
        byte[] headerNoMac = Arrays.copyOfRange(ciphertext, 0, headerLen);
        String macB64 = macLine.startsWith("--- ") ? macLine.substring(4) : "";
        byte[] macKey = hkdf(fileKey, new byte[0], "header".getBytes(StandardCharsets.US_ASCII));
        byte[] expected = hmacSha256(macKey, headerNoMac);
        if (!java.security.MessageDigest.isEqual(b64decodeCanonical(macB64), expected))
            throw new IllegalArgumentException("header MAC mismatch");

        if (ciphertext.length < macEnd + NONCE_SIZE)
            throw new IllegalArgumentException("truncated payload nonce");
        byte[] nonce = Arrays.copyOfRange(ciphertext, macEnd, macEnd + NONCE_SIZE);
        byte[] payloadKey = hkdf(fileKey, nonce, "payload".getBytes(StandardCharsets.US_ASCII));

        int sealedStart = macEnd + NONCE_SIZE;
        int sealedLen = ciphertext.length - sealedStart;
        if (sealedLen < TAG_SIZE) throw new IllegalArgumentException("truncated payload");
        int sealedChunk = CHUNK_SIZE + TAG_SIZE;
        int nChunks = Math.max(1, (sealedLen + sealedChunk - 1) / sealedChunk);
        ByteArrayOutputStream out = new ByteArrayOutputStream(sealedLen - TAG_SIZE * nChunks);
        for (int i = 0; i < nChunks; i++) {
            int from = sealedStart + i * sealedChunk;
            int to = Math.min(ciphertext.length, from + sealedChunk);
            boolean fin = i == nChunks - 1;
            if (!fin && to - from != sealedChunk)
                throw new IllegalArgumentException("short non-final payload chunk");
            if (fin && to - from == TAG_SIZE && i > 0)
                throw new IllegalArgumentException("empty final chunk in non-empty payload");
            try {
                out.writeBytes(chacha(Cipher.DECRYPT_MODE, payloadKey, chunkNonce(i, fin),
                        Arrays.copyOfRange(ciphertext, from, to)));
            } catch (Exception e) {
                throw new IllegalArgumentException("payload authentication failed");
            }
        }
        return out.toByteArray();
    }

    /** Raw public share for a private key — cacheable by callers. */
    static byte[] publicShare(PrivateKey sk) throws Exception {
        return publicToRaw(kpFromPrivate(sk));
    }

    /** Derive the public key for a private scalar (X25519 base-point mult). */
    private static PublicKey kpFromPrivate(PrivateKey sk) throws Exception {
        // The JDK offers no direct scalar-mult API; run an agreement against
        // the base point u=9 — X25519(scalar, 9) IS the public key.
        byte[] base = new byte[32];
        base[0] = 9;
        byte[] pubRaw;
        KeyAgreement ka = KeyAgreement.getInstance("X25519");
        ka.init(sk);
        ka.doPhase(rawToPublic(base), true);
        pubRaw = ka.generateSecret();
        return rawToPublic(pubRaw);
    }
}
