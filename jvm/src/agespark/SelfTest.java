package agespark;

import java.util.Base64;

/**
 * Standalone interop harness (no Spark needed):
 *   java agespark.SelfTest enc &lt;recipient&gt; &lt;plaintext&gt;        → base64(ciphertext)
 *   java agespark.SelfTest encmulti &lt;r1,r2,...&gt; &lt;plaintext&gt;   → base64(ciphertext)
 *   java agespark.SelfTest dec &lt;identity&gt; &lt;b64-ct&gt;            → plaintext
 * Used by tests/test_jvm_crypto.py to pin Java↔Python wire compatibility.
 */
public final class SelfTest {
    public static void main(String[] args) throws Exception {
        if (args[0].equals("enc")) {
            byte[] ct = AgeCrypto.encrypt(
                    args[2].getBytes("UTF-8"), AgeCrypto.decodeRecipient(args[1]));
            System.out.println(Base64.getEncoder().encodeToString(ct));
        } else if (args[0].equals("encmulti")) {
            String[] recips = args[1].split(",");
            byte[][] raws = new byte[recips.length][];
            java.security.PublicKey[] pubs = new java.security.PublicKey[recips.length];
            for (int i = 0; i < recips.length; i++) {
                raws[i] = AgeCrypto.decodeRecipient(recips[i]);
                pubs[i] = AgeCrypto.rawToPublic(raws[i]);
            }
            byte[] ct = AgeCrypto.encryptMulti(args[2].getBytes("UTF-8"), raws, pubs);
            System.out.println(Base64.getEncoder().encodeToString(ct));
        } else {
            byte[] pt = AgeCrypto.decrypt(
                    Base64.getDecoder().decode(args[2]), AgeCrypto.decodeIdentity(args[1]));
            System.out.println(new String(pt, "UTF-8"));
        }
    }
}
